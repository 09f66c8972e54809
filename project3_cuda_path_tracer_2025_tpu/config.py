"""Render configuration.

One runtime dataclass replaces the reference's three config layers
(compile-time ``#define`` toggles ``src/pathtrace.cu:20-24``, hardcoded
constants ``src/utilities.h:19-20`` / ``src/scene.cpp:470`` /
``src/intersections.cu:166``, and the JSON camera block).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All knobs of the renderer, hashable so it can be a jit static arg.

    Feature toggles (reference ``src/pathtrace.cu:21-24``):

    * ``stream_compaction`` -- reference ``STREAM_COMPACTION``: in the
      wavefront integrator, front-pack live rays each bounce (prefix-sum
      permutation) so trailing blocks can be skipped.  In the megakernel
      integrator termination is a mask either way; the flag only controls the
      wavefront repacking.
    * ``material_sorting`` -- reference ``MATERIAL_SORTING``: stable-sort live
      rays by material id before shading so each material bucket is dense.
    * ``bvh_acceleration`` -- reference ``BVH_ACCELERATION``: traverse the
      threaded BVH; when False, brute-force every triangle (the A/B oracle,
      reference ``NAIVE_MESH_LOADING`` path ``src/pathtrace.cu:365-395``).
    """

    # Feature toggles (A/B parity with src/pathtrace.cu:21-24)
    # True = front-pack every bounce (the reference's STREAM_COMPACTION);
    # "adaptive" = front-pack only once the live fraction drops below 1/2,
    # decided per bounce ON DEVICE (lax.cond on the live count).  Images
    # are identical either way -- compaction is a pure permutation and RNG
    # is pixel-keyed -- but on TPU every stage is static-shape, so packing
    # mostly-live bounces costs a permutation (measured 7.3 of the 9.4
    # ms/bounce on cornell) and buys nothing; the reference's SIMT GPU, by
    # contrast, profits from fewer threads.  Wavefront profiling:
    # scripts/profile_wavefront.py.  Default is "adaptive" (the measured
    # winner: 32.4 vs 82.4 ms with tiers, PARITY.md); True/False remain
    # as the reference's parity toggles.
    stream_compaction: "bool | str" = "adaptive"
    material_sorting: bool = False
    bvh_acceleration: bool = True

    # Integrator family: "megakernel" (one fused jit, bounce loop unrolled,
    # masked termination) or "wavefront" (per-bounce stages with compaction /
    # material sort, mirroring the reference architecture).
    integrator: str = "megakernel"

    # Shader: "full" (kernShadeMaterialProper + scatterRay) or "fake" (the
    # reference's shadeFakeMaterial demo, src/pathtrace.cu:459-502).
    shader: str = "full"

    # Samples traced per launch (batched spp amortizes dispatch overhead; the
    # reference always traces 1 spp per frame).
    spp_per_launch: int = 1

    # Numerical constants -- load-bearing for image parity
    # (src/utilities.h:19-20, src/intersections.h:29-32).
    baby_epsilon: float = 1e-5
    larger_epsilon: float = 1e-3
    ray_advance_epsilon: float = 1e-4

    # BVH build/traversal (src/scene.cpp:470, src/intersections.cu:166).
    bvh_leaf_size: int = 4
    # Upper bound on threaded-traversal steps; None = 2 * num_nodes.
    traversal_max_steps: Optional[int] = None
    # Use the native C++ BVH builder when available (falls back to NumPy).
    native_bvh: bool = True

    # Fused Pallas bounce kernel (intersect+shade in one program; applies to
    # scenes with no triangles/textures): "auto" (on TPU), "on" (everywhere,
    # interpreted on CPU -- slow, tests only), "off".
    fused_bounce: str = "auto"

    # Mesh intersector selection:
    #   "auto"     -- MXU block-sparse matmul kernel on TPU, threaded BVH on CPU
    #   "mxu"      -- force the Pallas MXU intersector (interpret-mode on CPU)
    #   "threaded" -- octant-ordered threaded-BVH gather walk (jnp)
    #   "brute"    -- all-triangles sweep (the reference's NAIVE_MESH_LOADING
    #                 oracle); also selected by bvh_acceleration=False
    mesh_intersector: str = "auto"

    # Per-bounce ray-coherence sorting for the MXU mesh intersector:
    #   "auto" -- on whenever the MXU intersector runs on TPU
    #   "on" / "off" -- force (A/B toggle; results are bit-identical either
    #                   way -- the sort is a pure permutation around the
    #                   kernel -- only speed changes)
    # 6D key: coarse position morton (ray_sort_bits/axis, major) then
    # direction morton (ray_sort_dir_bits/axis, minor; top bit = octant).
    # Dead rays sort to the end so trailing blocks skip whole.
    ray_sorting: str = "auto"
    ray_sort_bits: int = 2
    ray_sort_dir_bits: int = 4
    # Sort key family:
    #   "signature" -- per-ray nearest-candidate-TILE ids packed front-to-
    #                  back (blocks become candidate-homogeneous, so the
    #                  planned traversal's per-block tile unions collapse
    #                  toward each ray's own ~O(T^1/3) candidate list)
    #   "morton"    -- 6D (position, direction) morton key (round-2 key)
    #   "auto"      -- signature (measured faster at every mesh size)
    ray_sort_mode: str = "auto"
    # Resort cadence for the PERSISTENT sort in the fused mesh path: 1 =
    # every bounce; k = reuse the previous order for k-1 bounces (coherence
    # goes stale but the argsort+gather wrapper cost amortizes).
    ray_sort_every: int = 1
    # Sort bounce 0 too?  Camera rays arrive in pixel order, which is
    # already image-coherent (root-missing rays cluster into whole screen
    # regions = skippable blocks), so the first argsort+apply may be pure
    # overhead.  Bit-identical either way (the sort is a pure permutation).
    ray_sort_first_bounce: bool = True

    # MXU-intersector attribute resolve: "gather" ([Tp,24] row gather, flat
    # cost -- measured faster at every size) or "onehot" (one-hot matmul,
    # flops scale with tri count; kept as the A/B oracle).
    mxu_attr_resolve: str = "gather"

    # MXU-intersector traversal: "sweep" iterates every tile with in-kernel
    # slab culls; "planned" precomputes per-block front-to-back candidate
    # tile lists in XLA (scalar-prefetched) and walks them with an early
    # exit -- the BVH's ordered descent at block x tile granularity;
    # "streamed" is one pallas_call for ANY mesh size (plan rows DMA'd
    # HBM->SMEM per block, candidate feature tiles DMA'd HBM->VMEM double-
    # buffered, GLOBAL front-to-back early exit); "binned" regroups the
    # sorted live prefix into 8-ray packets and bins (packet, tile)
    # candidate pairs tile-major, so kernel work scales with packet
    # candidate sums instead of 256-ray block unions (mid-bounce
    # populations on heavy meshes; falls back to streamed when live rays
    # exceed the prefix or bins overflow); "mono" (tiny meshes) statically
    # unrolls EVERY tile with no plan at all -- straight-line code
    # pipelines matmuls under epilogues and the XLA plan prepass
    # disappears (measured faster than walking the plan at <= 8 tiles,
    # round-5 profile).  Bit-identical results (tested; per-ray candidate
    # contract in ops/intersect_mxu.py); "auto" picks mono <= 8k tris,
    # planned for other VMEM-resident meshes (<= 32k tris), binned in its
    # measured winning band (~128k-320k padded tris; 659 vs 917 ms at 200k
    # on v5e), streamed for everything else (intersect_mxu.
    # resolve_traversal_mode).
    mxu_traversal: str = "auto"
    # Tile-plan builder for the planned/streamed walks: "exact" = the
    # per-ray O(N*Ct) slab sweep; "frustum" = O(NB*Ct) interval-arithmetic
    # slabs on per-block ray envelopes -- a conservative SUPERSET plan
    # (bit-identical results by the candidate contract) whose prepass is
    # ~free, but whose envelope-hull candidate sets and looser entry
    # bounds measured a NET frame-level LOSS on v5e (5k 146.3 vs 143.6,
    # 80k 504 vs 420 ms): extra tile visits + a later-firing early exit
    # cost more than the prepass saves.  "auto" = exact.
    mxu_plan: str = "auto"
    # Where the fused MESH bounce keeps its ray state between bounces:
    #   "sorted" -- persistent coherence order: each bounce argsorts the
    #     carried key and PERMUTES the whole path state (one packed [N,12]
    #     row gather + stack/unpack, measured ~3.4 ms/bounce at 640k);
    #     prefix tiers then slice every stage to the alive prefix.
    #   "pixel"  -- state stays in pixel order; the carried key is handed
    #     to the intersector, which sorts ONLY its ray-feature rows (a
    #     [N,16] row gather it builds anyway) and scatters (t, tri) back.
    #     The state permute disappears; bounce prefix tiers cannot engage
    #     (alive rays are scattered in pixel order).
    # Bit-identical either way (permutation-invisibility is the tested
    # invariant: sorted == unsorted images bit-exact).  "auto" = sorted:
    # the round-5 pinned A/B measured pixel order a ~1.5-1.8x frame LOSS
    # (5k 236.8 vs 133.6, 20k 367.6 vs 262.5 ms) -- the forfeited prefix
    # tiers plus the in-intersector sort+scatter far outweigh the
    # ~3.4 ms/bounce state permute they replace.  Kept as the A/B toggle.
    mesh_state_order: str = "auto"
    # Live-prefix tiers for the binned traversal, as divisors of the ray
    # count (ascending coverage): the smallest prefix holding every live
    # ray engages; beyond the largest, the streamed walk runs.  Each tier
    # compiles its own kernel; the pair budget is tier-INDEPENDENT
    # (sized at the n/4 prefix), so deeper tiers only shrink bin
    # construction.  The 1/8 tier carries every bounce of the 200k bench
    # scene (live_pos <= 77k measured, PARITY.md).
    mxu_binned_tiers: tuple = (8, 4, 2)
    # Prefix tiers for the WHOLE fused mesh bounce, as divisors of the ray
    # count: with persistent sorting, every alive ray sits inside the
    # previous bounce's alive prefix, so all per-bounce stages (prim
    # prepass, sort, permute, RNG, intersect, resolve, shade) can run over
    # a static prefix covering the alive region -- a lax.cond picks the
    # smallest tier holding every alive ray, falling back to full-N.
    # Results are bit-identical (elementwise stages + pixel-keyed RNG).
    # () disables tiering.  Requires ray sorting.  Also engages the
    # textured-PRIM fused path (fused_tex_bounce), where it adds a stable
    # liveness-packing sort so the tiers have a prefix to slice, and the
    # WAVEFRONT integrator (gated on stream compaction, whose front-pack
    # provides the prefix there).  "auto" (the default) resolves to (4, 2)
    # on accelerators -- the measured winner on every TPU scene (PARITY.md
    # round-3 campaign table) -- and () on CPU, where the lax.cond tier
    # chain only multiplies compile time.  The binned MXU traversal ignores
    # bounce tiers (it tiers internally via mxu_binned_tiers; composing
    # both re-bins per tier and measured 952 vs 659 ms at 200k).
    bounce_prefix_tiers: "tuple | str" = "auto"

    # Split each iteration into C sequential same-shaped dispatches over
    # contiguous pixel blocks (the megakernel's shard path with a traced
    # block-id -- ONE compiled program, C launches).  Identical to
    # unchunked up to XLA fusion rounding (pixel-keyed RNG; megakernel
    # paths measure bit-exact, the wavefront shard program re-fuses FMA
    # contraction at <=1e-6 -- tests/test_chunked.py).
    # Purpose: bounding per-program ray count for configs that overwhelm
    # the backend -- the brute-force A/B (bvh_acceleration=False) faults
    # the axon TPU worker at 800^2 in one 640k-ray program (PARITY.md
    # round-3) but completes chunked (8667 ms/frame at pixel_chunks=8,
    # round-4 campaign 2).  1 = off.  0 = AUTO: engage chunking only for
    # that measured fault class -- brute force on an accelerator at
    # >= ~200k rays -- so the naive CLI brute-force run completes without
    # the user knowing the workaround (see resolved_pixel_chunks).
    pixel_chunks: int = 0

    # Multi-chip scale-out (shard_map over ICI; parallel/shardmap.py).
    #   devices = 1: single chip (default).  devices = N: render across the
    #   first N jax devices.  parallel_mode:
    #   "pixel"  -- shard the W*H path slots (bit-identical to single chip)
    #   "sample" -- each chip renders the full frame at its own iteration
    #               number; films sum at save (one step advances N spp)
    devices: int = 1
    parallel_mode: str = "pixel"

    # Loop lowering: Python-unroll the bounce loop (better fusion, bigger
    # HLO) vs lax.fori_loop (compact HLO).  None = auto (unroll).
    unroll_bounces: Optional[bool] = None
    # Python-unroll the <=leaf_size triangle tests inside BVH traversal.
    unroll_leaf: bool = True

    # Camera parity quirks.
    # The reference re-derives the render camera from spherical coordinates on
    # the first frame (src/main.cpp:423-444) instead of using EYE directly.
    spherical_camera_reconstruction: bool = True

    # Output parity: saveImage writes the PNG horizontally mirrored
    # (src/main.cpp:407).
    mirror_output: bool = True

    # Debugging: enable finite-value checks on path state each bounce.
    debug_nan_checks: bool = False

    def __post_init__(self):
        # Tier fields must be tuples: the config is a jit static arg
        # (hashable) and bench/CLI layers hand these in as JSON lists.
        for f in ("mxu_binned_tiers", "bounce_prefix_tiers"):
            v = getattr(self, f)
            if v == "auto" and f == "bounce_prefix_tiers":
                continue
            if not isinstance(v, tuple):
                object.__setattr__(self, f, tuple(v))
        # stream_compaction is bool | "adaptive", but sibling toggles use
        # "on"/"off" strings -- normalize those rather than letting a
        # truthy "off" silently ENABLE compaction, and reject the rest.
        if self.mesh_state_order not in ("auto", "sorted", "pixel"):
            raise ValueError(
                f"mesh_state_order={self.mesh_state_order!r}: use "
                "'auto'/'sorted'/'pixel'"
            )
        sc = self.stream_compaction
        if isinstance(sc, str) and sc != "adaptive":
            if sc in ("on", "true", "1"):
                object.__setattr__(self, "stream_compaction", True)
            elif sc in ("off", "false", "0"):
                object.__setattr__(self, "stream_compaction", False)
            else:
                raise ValueError(
                    f"stream_compaction={sc!r}: use True/False/'adaptive'"
                )

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def resolved_prefix_tiers(self) -> tuple:
        """``bounce_prefix_tiers`` with the "auto" sentinel resolved against
        the live backend: (4, 2) on accelerators, () on CPU (where the tier
        cond chain only multiplies compile time -- test suites run CPU)."""
        t = self.bounce_prefix_tiers
        if t != "auto":
            return t
        import jax

        return (4, 2) if jax.default_backend() != "cpu" else ()

    def resolved_pixel_chunks(self, pixel_count: int, backend=None) -> int:
        """``pixel_chunks`` with the 0 = auto sentinel resolved: chunking
        auto-engages ONLY for the measured axon fault class (brute-force
        ``bvh_acceleration=False`` on an accelerator at >= ~200k rays,
        PARITY.md rounds 1-4) by picking the smallest divisor of the pixel
        count that bounds per-program rays to <= ~96k (800^2 -> 8 chunks,
        the configuration measured to complete).  Everything else runs
        unchunked.  ``backend`` overrides the live jax backend (tests)."""
        if self.pixel_chunks != 0:
            return self.pixel_chunks
        if backend is None:
            import jax

            backend = jax.default_backend()
        if (
            self.bvh_acceleration
            or backend == "cpu"
            or pixel_count < 200_000
        ):
            return 1
        for c in range(2, 65):
            if pixel_count % c == 0 and pixel_count // c <= 96_000:
                return c
        return 1  # no divisor bounds the program; run unchunked
