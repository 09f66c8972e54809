"""MXU ray-triangle intersector: Moller-Trumbore as block-sparse matmuls.

Why: measured on this TPU, XLA/Pallas per-lane gathers run at ~0.12 Gelem/s
(a serial hardware path), so any traversal that chases per-ray pointers --
the reference's stacked BVH walk (``src/intersections.cu:148-234``) or a
threaded/skip-link rewrite -- is dispatch- and gather-bound regardless of
step count.  The systolic array, by contrast, delivers tens of TFLOP/s on
dense tiles.  So intersection is reformulated as dense linear algebra:

Each Moller-Trumbore scalar is *bilinear* in per-ray and per-triangle
features (triple-product identities; same epsilon semantics as
``intersectTriangle``, ``src/intersections.cu:112-145``):

    det   =  d . (e2 x e1)
    u*det = (o x d) . e2   -  d . (e2 x v0)
    v*det = -(o x d) . e1  -  d . (v0 x e1)
    t*det =  o . (e1 x e2) - v0 . (e1 x e2)

With the 10-vector ray feature R = [d, o x d, o, 1] all four quantities for
a whole (ray tile x triangle tile) block are ONE [Rt, 10] @ [10, 4*Tt]
matmul.  A Pallas kernel streams triangle tiles (BVH-leaf order, so tiles
are spatially tight) against ray tiles, keeps the running closest hit
(t, u, v, tri) in the output block, and skips a tile's matmul entirely when
no ray in the block can hit the tile's bounding box closer than its current
best (block-sparsity = the BVH's culling, at tile granularity).

Numerical note: features are built about the scene centroid (rays and
triangles shifted identically) to keep |o x d| small; results match the
sequential MT formulation to f32 roundoff.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vec import Vec3
from .intersect import MeshHit

import os

# Tunable via env for hardware sweeps; defaults = best measured on v5e.
# A finer two-level cull hierarchy (TRI_TILE < GROUP) was swept on hardware
# and LOST: per-fine-tile fixed costs (dynamic-slice slab + cross-sublane
# any-reduce + lax.cond, ~0.5 us/visit) cancel the epilogue savings at
# [256, 128] tiles.  Best measured remains single-level 1024-tri tiles; the
# effective cull lever is the per-ray ROOT prepass in ``_run`` (see below),
# which removes whole rays, not tiles.
RAY_TILE = int(os.environ.get("PTT_RAY_TILE", "256"))  # rays per block
TRI_TILE = int(os.environ.get("PTT_TRI_TILE", "1024"))  # tris per fine tile
GROUP_TILES = int(os.environ.get("PTT_GROUP_TILES", "1"))  # fine tiles/group
GROUP_TRIS = TRI_TILE * GROUP_TILES
USE_TILE_CULL = os.environ.get("PTT_TILE_CULL", "1") == "1"
NUM_F = 16  # padded ray-feature dim (10 used)

# Max triangles whose [NUM_F, 4*T] f32 feature table fits the VMEM budget
# (8 MB, well under the ~16 MB/core so ray/quad tiles still fit).  Larger
# meshes run as a chunked multi-call chain: each chunk's table is
# VMEM-resident for its call, the running closest hit threads through as
# the next chunk's t_limit (see ``_run``).
CHUNK_TRIS = int(os.environ.get("PTT_CHUNK_TRIS", str(32 * 1024)))
assert CHUNK_TRIS % GROUP_TRIS == 0 or CHUNK_TRIS < GROUP_TRIS

# Super-tile streamed walk (see _streamed_super_kernel): group SUPER_TILES
# contiguous feature tiles per plan row / DMA / early-exit quantum, with a
# static inner unroll over the member tiles.  The hypothesis was that the
# 500k-class linear scaling is walk-machinery-bound (plan rows, DMA
# bookkeeping, exit checks amortize over 8 tiles); the round-5 pinned A/B
# measured a 5% LOSS instead (500k: super 2536.8 vs streamed control
# 2409.2 ms same-session) -- the 8-tile quantum makes every visited super
# evaluate its full member unroll, and that extra epilogue work exceeds
# the amortized machinery.  Kept as an opt-in (PTT_STREAM_SUPER=1) with
# its exactness contract and tests; default OFF.
SUPER_TILES = int(os.environ.get("PTT_SUPER_TILES", "8"))
STREAM_SUPER_MIN = int(os.environ.get("PTT_STREAM_SUPER_MIN", str(320 * 1024)))


def stream_super_enabled(padded_tris: int) -> bool:
    # Default "0": the round-5 pinned A/B measured the super walk a net
    # loss (comment above); "auto" (> STREAM_SUPER_MIN) and "1" (force)
    # remain for A/Bs and future backends.
    mode = os.environ.get("PTT_STREAM_SUPER", "0")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return padded_tris > STREAM_SUPER_MIN


# Plan-free static-unroll traversal band (see _mono_kernel): sweeping all
# live-block tiles beats walking a plan while live_blocks * Ct stays close
# to the plan's candidate count (measured 1.47x at 5k mid-bounce, where
# mono still wins) AND the plan prepass cost is nonzero.  Beyond ~8 tiles
# the sweep multiple grows and the planned walk takes over.  Round-5
# frame A/Bs: mono 133.6 vs planned 142.0 ms at 5k (5 tiles); forcing 20
# tiles OOMs VMEM (the static unroll keeps every tile's quad live on the
# Mosaic stack), so the band cannot be pushed past ~8 as-built.
MONO_MAX_TILES = int(os.environ.get("PTT_MONO_MAX_TILES", "8"))

# --- the candidate-set contract (why every path is bit-identical) --------
#
# A (ray, tile) pair is a CANDIDATE iff the ray's OWN widened slab test
# enters the tile's AABB closer than its t_limit, and a triangle hit is
# accepted only if it passes the MT epilogue AND its t lies inside that
# widened slab interval.  The winner is the minimum-t (ties: lowest
# triangle id) over this per-ray candidate set -- a definition that does
# not mention blocks, chunks, visit order, or early exits.  Every
# traversal (sweep / planned / streamed) evaluates each candidate pair
# with the same f32 arithmetic and merely needs its visit set to COVER
# the candidates, so all paths agree bit-for-bit by construction.
#
# Without the per-ray mask this was only empirically true: a per-BLOCK
# any() keeps a tile alive through a blockmate, and near-degenerate
# triangles (|det| ~ baby_eps, e.g. the 200k-tri mesh's ~1e-5 dets) then
# produce false "hits" on tiles the ray geometrically MISSES -- f32
# artifacts outside the slab interval.  Measured: 10/640k rays diverged
# between the chunked sweep and the planned path on the 200k mesh, each
# reporting a different false positive (f64 re-check: the masked result
# is the geometrically correct one).
#
# Slab margins: f32 slab arithmetic carries a few ulps of rounding, so
# cull-side tests widen their interval before comparing.  The kernel's
# member test widens by 1x; XLA-side culls that must be SUPERSETS of it
# (root cull, chunk envelope, tile plan -- computed by a different
# compiler whose rounding may differ by an ulp) widen by 2x.  Margins
# only admit extra candidates (speed, never correctness); SLAB_EPS_ABS
# is ~1e-4 of a ~10-unit scene box.
SLAB_EPS_REL = 4e-6  # Python floats: Pallas kernels can't capture traced
SLAB_EPS_ABS = 1e-4  # constants, and f32 ops fold float literals for free


def _widen_slab(tlo, thi, k=1):
    """Widen a slab interval so f32 rounding can never flip a graze into a
    miss: lower tlo and raise thi by rel+abs margins (conservative for the
    hit test, and the lowered tlo stays a true lower bound on any hit t the
    box can produce -- required by the planned/streamed early exit).
    ``k=2`` for culls that must be supersets of the kernel's k=1 member
    test across compiler rounding differences (see contract above)."""
    return (
        tlo - (k * SLAB_EPS_REL) * jnp.abs(tlo) - (k * SLAB_EPS_ABS),
        thi + (k * SLAB_EPS_REL) * jnp.abs(thi) + (k * SLAB_EPS_ABS),
    )


def _member_slab(row, o, inv, tlim):
    """Per-ray candidate test against ONE AABB row ([1, 8]): can this ray
    itself enter the box before its t_limit?  Returns (member, tlo, thi),
    each [R, 1], with the widened interval.  This is THE candidate-set
    definition (see module contract): every kernel uses this helper so the
    arithmetic is identical across traversals, and accepted hits are
    confined to [tlo, thi]."""
    t1 = (row[:, 0:3] - o) * inv
    t2 = (row[:, 3:6] - o) * inv
    tlo = jnp.max(jnp.minimum(t1, t2), axis=1, keepdims=True)
    thi = jnp.min(jnp.maximum(t1, t2), axis=1, keepdims=True)
    tlo, thi = _widen_slab(tlo, thi)
    member = (thi >= tlo) & (thi > 0.0) & (tlo < tlim)
    return member, tlo, thi


class MXUMeshTables(NamedTuple):
    """Dense per-triangle feature + attribute tables (pytree of arrays;
    the static sizes live in ``SceneStatic.num_triangles`` /
    ``SceneStatic.mxu_padded_tris``)."""

    features: jnp.ndarray  # [NUM_F, 4*Tp] f32: columns (det|u|v|t) per tri
    tile_aabb: jnp.ndarray  # [Cf, 8] f32 per fine-tile bounds (xyz min/max, pad)
    group_aabb: jnp.ndarray  # [Cg, 8] f32 per coarse-group bounds
    # attribute resolve tables (leaf order), one row per triangle:
    # n0 n1 n2 (9) uv0 uv1 uv2 (6) dpdu dpdv (6) mat (1) pad (2)
    # v0 (3) e1 (3) e2 (3) pad (7)  -- geometry for winner (u,v) recompute
    attrs: jnp.ndarray  # [Tp, 40] f32
    # Slim row table for the untextured fused path (gather cost scales with
    # row width): n0 n1 n2 (9) mat (1) v0 e1 e2 (9) pad (5)
    attrs_shade: jnp.ndarray  # [Tp, 24] f32
    center: jnp.ndarray  # [3] scene recentering offset


def build_mxu_tables(
    pos: np.ndarray,  # [T, 3, 3] leaf-ordered triangle vertices
    nrm: np.ndarray,  # [T, 3, 3]
    uv: np.ndarray,  # [T, 3, 2]
    dpdu: np.ndarray,  # [T, 3]
    dpdv: np.ndarray,  # [T, 3]
    mat: np.ndarray,  # [T]
) -> MXUMeshTables:
    t = pos.shape[0]
    tp = ((t + GROUP_TRIS - 1) // GROUP_TRIS) * GROUP_TRIS
    if tp > CHUNK_TRIS and stream_super_enabled(tp):
        # The SUPER-tile streamed walk's per-visit DMA moves SUPER_TILES
        # contiguous tiles -- pad the table to a super multiple so the
        # last transfer stays in bounds (never-hit padding tiles; <= 8k
        # fake tris).  Only when the super walk is actually enabled: the
        # pad changes every downstream plan/bin shape for ALL >CHUNK
        # meshes, and the non-super paths must keep their round-4 shapes.
        span = SUPER_TILES * TRI_TILE
        tp = ((tp + span - 1) // span) * span
    center = pos.reshape(-1, 3).mean(axis=0).astype(np.float32)

    v0 = pos[:, 0].astype(np.float64) - center
    e1 = (pos[:, 1] - pos[:, 0]).astype(np.float64)
    e2 = (pos[:, 2] - pos[:, 0]).astype(np.float64)

    a = np.cross(e2, e1)  # det row block
    e2xv0 = np.cross(e2, v0)
    v0xe1 = np.cross(v0, e1)
    e1xe2 = np.cross(e1, e2)
    v0_dot = np.einsum("ij,ij->i", v0, e1xe2)

    # Column layout per tri tile c (so the kernel slices, never reshapes --
    # Mosaic cannot split the lane dimension):
    #   [c*4K + 0*K + j] = det   of tile-local tri j   (K = TRI_TILE)
    #   [c*4K + 1*K + j] = u_num
    #   [c*4K + 2*K + j] = v_num
    #   [c*4K + 3*K + j] = t_num
    feat = np.zeros((NUM_F, 4 * tp), np.float32)
    k = TRI_TILE
    gidx = np.arange(t)
    tile_of = gidx // k
    j = gidx % k
    det_c = tile_of * 4 * k + j
    u_c = det_c + k
    v_c = det_c + 2 * k
    t_c = det_c + 3 * k
    # det = d . (e2 x e1)
    feat[0:3, det_c] = a.T
    # u_num = (o x d) . e2 - d . (e2 x v0)
    feat[0:3, u_c] = -e2xv0.T
    feat[3:6, u_c] = e2.T
    # v_num = -(o x d) . e1 - d . (v0 x e1)
    feat[0:3, v_c] = -v0xe1.T
    feat[3:6, v_c] = -e1.T
    # t_num = o . (e1 x e2) - v0 . (e1 x e2)
    feat[6:9, t_c] = e1xe2.T
    feat[9, t_c] = -v0_dot

    # Padded (fake) triangles: all-zero features -> det == 0 -> never hit.

    # Per-tile AABBs (both levels) over member triangle vertices, in the
    # same recentered frame the kernel's ray origins use.
    shifted = pos.astype(np.float64) - center

    def level_aabbs(span: int) -> np.ndarray:
        c = tp // span
        out = np.zeros((c, 8), np.float32)
        for i in range(c):
            lo = i * span
            hi = min(t, lo + span)
            if lo >= t:
                # empty padding tile: inverted bounds never hit
                out[i, 0:3] = 1e30
                out[i, 3:6] = -1e30
                continue
            tv = shifted[lo:hi].reshape(-1, 3)
            # Conservative f32 cast: round-to-nearest could shrink the box by
            # half an ulp, and the planned kernel's early exit treats the slab
            # tlo as an EXACT lower bound on any hit t the tile can produce.
            # Widen outward so the conservativeness holds by construction.
            bmin, bmax = tv.min(axis=0), tv.max(axis=0)
            lo32 = bmin.astype(np.float32)
            hi32 = bmax.astype(np.float32)
            lo32 = np.where(
                lo32.astype(np.float64) > bmin,
                np.nextafter(lo32, np.float32(-np.inf)), lo32,
            )
            hi32 = np.where(
                hi32.astype(np.float64) < bmax,
                np.nextafter(hi32, np.float32(np.inf)), hi32,
            )
            out[i, 0:3] = lo32
            out[i, 3:6] = hi32
        return out

    tile_aabb = level_aabbs(TRI_TILE)
    group_aabb = level_aabbs(GROUP_TRIS)

    # Attribute rows also carry the triangle geometry (v0/e1/e2, world
    # space) so the winner's (u, v) barycentrics are recomputed per ray
    # AFTER the kernel (one elementwise Moller-Trumbore) -- this removed two
    # masked pick-reductions from the kernel's per-tile epilogue.
    attrs = np.zeros((tp, 40), np.float32)
    attrs[:t, 0:3] = nrm[:, 0]
    attrs[:t, 3:6] = nrm[:, 1]
    attrs[:t, 6:9] = nrm[:, 2]
    attrs[:t, 9:11] = uv[:, 0]
    attrs[:t, 11:13] = uv[:, 1]
    attrs[:t, 13:15] = uv[:, 2]
    attrs[:t, 15:18] = dpdu
    attrs[:t, 18:21] = dpdv
    attrs[:t, 21] = mat.astype(np.float32)
    attrs[:t, 24:27] = pos[:, 0]
    attrs[:t, 27:30] = pos[:, 1] - pos[:, 0]
    attrs[:t, 30:33] = pos[:, 2] - pos[:, 0]

    attrs_shade = np.zeros((tp, 24), np.float32)
    attrs_shade[:, 0:9] = attrs[:, 0:9]  # vertex normals
    attrs_shade[:, 9] = attrs[:, 21]  # material id
    attrs_shade[:, 10:19] = attrs[:, 24:33]  # v0, e1, e2

    return MXUMeshTables(
        features=jnp.asarray(feat),
        tile_aabb=jnp.asarray(tile_aabb),
        group_aabb=jnp.asarray(group_aabb),
        attrs=jnp.asarray(attrs),
        attrs_shade=jnp.asarray(attrs_shade),
        center=jnp.asarray(center),
    )


def dummy_mxu_tables() -> MXUMeshTables:
    never = jnp.full((1, 8), 1e30, jnp.float32).at[0, 3:6].set(-1e30)
    return MXUMeshTables(
        features=jnp.zeros((NUM_F, 4 * GROUP_TRIS), jnp.float32),
        tile_aabb=jnp.tile(never, (GROUP_TILES, 1)),
        group_aabb=never,
        attrs=jnp.zeros((GROUP_TRIS, 40), jnp.float32),
        attrs_shade=jnp.zeros((GROUP_TRIS, 24), jnp.float32),
        center=jnp.zeros((3,), jnp.float32),
    )


def root_hit_mask(
    tile_aabb: jnp.ndarray,
    center: jnp.ndarray,
    ox, oy, oz, dx, dy, dz,
    t_limit: jnp.ndarray,
) -> jnp.ndarray:
    """Per-ray BVH-root test: can the ray enter the mesh's root AABB closer
    than its t_limit?  The root AABB is the envelope of the tile AABBs (same
    recentered frame, same slab arithmetic as the kernel's tile cull), so a
    False here is conservative: every tile test the kernel would run is
    guaranteed to fail too (slab bounds are monotone in the box bounds).
    The reference's BVH rejects such rays at its root node in one visit
    (src/intersections.cu:148-234); this is that test, vectorized."""
    root_lo = jnp.min(tile_aabb[:, 0:3], axis=0)  # [3]
    root_hi = jnp.max(tile_aabb[:, 3:6], axis=0)
    osx, osy, osz = ox - center[0], oy - center[1], oz - center[2]
    invx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
    invy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
    invz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)
    t1x, t2x = (root_lo[0] - osx) * invx, (root_hi[0] - osx) * invx
    t1y, t2y = (root_lo[1] - osy) * invy, (root_hi[1] - osy) * invy
    t1z, t2z = (root_lo[2] - osz) * invz, (root_hi[2] - osz) * invz
    tlo = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    thi = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    tlo, thi = _widen_slab(tlo, thi, k=2)
    return (thi >= tlo) & (thi > 0.0) & (tlo < t_limit)


def _morton_spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of v to every 3rd bit (standard 3D morton expansion)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _coherence_keys(
    osx, osy, osz, dxp, dyp, dzp, live, lo, hi, pos_bits: int,
    dir_bits: int = 3,
) -> jnp.ndarray:
    """6D ray-coherence sort key: coarse position morton (major), direction
    morton (minor).

    Bounce rays land on surfaces anywhere in the scene with scattered
    directions; 256-ray blocks in pixel order are spatially wild and the
    per-tile AABB cull never fires (ANY of 256 rays hitting the mesh bbox
    keeps the tile alive, and with direction spread that probability is ~1).
    Position alone is not enough either: from a fixed cell, a quarter-sphere
    of directions still almost surely contains the mesh.  So the key orders
    rays by (position cell, direction cone): blocks then share a tight
    frustum, whole blocks provably miss the mesh bbox, and the cull finally
    bites.  Dead rays get the max key and collect in all-dead trailing
    blocks, which skip entirely.

    ``pos_bits`` per position axis (coarse: a cell should hold >= a few
    blocks of rays so the direction bits can refine within it),
    ``dir_bits`` per direction axis (the top bit is the sign, i.e. the
    octant).  Key width = 3*(pos_bits + dir_bits) <= 30.

    origins are recentered (kernel frame); ``lo``/``hi`` is the mesh AABB in
    that same frame.
    """
    span = jnp.maximum(hi - lo, 1e-6)
    pscale = (1 << pos_bits) - 1

    def qp(o, axis):
        t = jnp.clip((o - lo[axis]) / span[axis], 0.0, 1.0)
        return (t * pscale).astype(jnp.int32)

    pos_code = (
        _morton_spread3(qp(osx, 0))
        | (_morton_spread3(qp(osy, 1)) << 1)
        | (_morton_spread3(qp(osz, 2)) << 2)
    )

    dscale = (1 << dir_bits) - 1

    def qd(d):
        t = jnp.clip((d + 1.0) * 0.5, 0.0, 1.0)
        return (t * dscale).astype(jnp.int32)

    dir_code = (
        _morton_spread3(qd(dxp))
        | (_morton_spread3(qd(dyp)) << 1)
        | (_morton_spread3(qd(dzp)) << 2)
    )

    key = (pos_code << (3 * dir_bits)) | dir_code
    return jnp.where(live > 0.0, key, jnp.int32(1 << 30))


def _signature_keys(
    tile_aabb, osx, osy, osz, dx, dy, dz, live, t_limit,
) -> jnp.ndarray:
    """Traversal-signature sort key: the ids of the ray's nearest candidate
    tiles, packed front-to-back (major = nearest).

    Why: morton (position, direction) keys group rays that are *near each
    other*, but the planned kernel's cost is the per-block UNION of candidate
    tiles -- and nearby rays can still straddle tile boundaries or aim at
    different shells of a large mesh, so blocks carry rays whose candidate
    sets barely overlap and the union stays large (the measured linear-in-
    triangles ceiling, PARITY.md "Where the architectures cross").  Sorting
    by the candidate list itself makes blocks candidate-homogeneous: a
    block's union approaches each member ray's own ~O(T^1/3)-tile list, so
    kernel work scales with the sum of per-ray candidates -- the reference
    BVH's scaling -- instead of block unions.

    The key is a heuristic (any permutation is bit-exact downstream); ties
    and quantization only affect speed.  Key layout, MSB->LSB: tile id of
    the nearest candidate, 2nd, 3rd (bits_id each), then a direction morton
    in any leftover bits.  Rays with no candidates sort to the end of the
    live range; dead rays are handled by the caller's sentinel."""
    n = osx.shape[0]
    ct = tile_aabb.shape[0]
    bits_id = max(1, (ct - 1).bit_length()) if ct > 1 else 1
    n_sig = 3 if 3 * bits_id <= 30 else 2
    dir_total = min(6, 30 - n_sig * bits_id)
    id_mask = jnp.int32((1 << bits_id) - 1)
    sentinel = jnp.int32(0x7FFFFFFF)

    invx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
    invy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
    invz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)
    livem = live > 0.0

    top = jnp.full((n, n_sig), sentinel, jnp.int32)
    TC = 16
    for c0 in range(0, ct, TC):
        rows = tile_aabb[c0 : c0 + TC]
        lo, hi = rows[:, 0:3], rows[:, 3:6]
        t1x = (lo[None, :, 0] - osx[:, None]) * invx[:, None]
        t2x = (hi[None, :, 0] - osx[:, None]) * invx[:, None]
        t1y = (lo[None, :, 1] - osy[:, None]) * invy[:, None]
        t2y = (hi[None, :, 1] - osy[:, None]) * invy[:, None]
        t1z = (lo[None, :, 2] - osz[:, None]) * invz[:, None]
        t2z = (hi[None, :, 2] - osz[:, None]) * invz[:, None]
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        hit = (
            (thi >= tlo) & (thi > 0.0)
            & (tlo < t_limit[:, None]) & livem[:, None]
        )
        # Packed candidate: coarse monotone bits of tlo (positive-f32
        # bitcast is order-preserving) with the low mantissa bits replaced
        # by the tile id -- one int, min-reducible, unique per tile.
        b = jax.lax.bitcast_convert_type(
            jnp.maximum(tlo, 0.0), jnp.int32
        )
        tid = (c0 + jax.lax.broadcasted_iota(jnp.int32, tlo.shape, 1))
        p = jnp.where(hit, (b & ~id_mask) | tid, sentinel)
        cand = jnp.concatenate([top, p], axis=1)
        new_top = []
        for _ in range(n_sig):
            m = jnp.min(cand, axis=1, keepdims=True)
            new_top.append(m[:, 0])
            cand = jnp.where(cand == m, sentinel, cand)
        top = jnp.stack(new_top, axis=1)

    ids = jnp.where(top == sentinel, id_mask, top & id_mask)
    sig = ids[:, 0]
    for k in range(1, n_sig):
        sig = (sig << bits_id) | ids[:, k]
    if dir_total >= 3:
        db = dir_total // 3  # bits per direction axis
        dscale = (1 << db) - 1

        def qd(d):
            t = jnp.clip((d + 1.0) * 0.5, 0.0, 1.0)
            return (t * dscale).astype(jnp.int32)

        dmorton = (
            _morton_spread3(qd(dx))
            | (_morton_spread3(qd(dy)) << 1)
            | (_morton_spread3(qd(dz)) << 2)
        )
        sig = (sig << (3 * db)) | dmorton
    return jnp.where(livem, sig, jnp.int32(1 << 30))


def coherence_key_planes(
    aabb_rows, cx, cy, cz, ox, oy, oz, dx, dy, dz, alive, t_limit,
) -> jnp.ndarray:
    """``coherence_perm``'s KEY (root mask + signature + dead-sentinel
    layering) for Pallas kernels: arbitrary array shapes (the fused shade
    kernel's [BLOCK_ROWS, 128] planes), a static Python loop over tiles
    (callers gate on small tile counts -- see KEY_INLINE_MAX_CT), and
    [1, 1]-slice broadcasting instead of [N, TC] intermediates.  The key
    layout matches ``_signature_keys`` bit-for-bit intent-wise, but exact
    equality with the XLA builder is NOT required: any permutation is
    bit-exact downstream (the sort is a pure permutation; RNG is
    pixel-keyed) -- only block homogeneity, i.e. speed, depends on it.

    ``aabb_rows``: [ct, 8] recentered tile bounds (an SMEM kernel ref or a
    jnp array -- indexed at STATIC (row, col) so every bound is a true
    scalar; Mosaic cannot broadcast lane-offset [1, 1] VMEM slices);
    ``cx/cy/cz``: scene-center scalars; ``alive``: bool; ``t_limit``: f32
    (the NEXT bounce's prim prune)."""
    ct = aabb_rows.shape[0]
    bits_id = max(1, (ct - 1).bit_length()) if ct > 1 else 1
    n_sig = 3 if 3 * bits_id <= 30 else 2
    dir_total = min(6, 30 - n_sig * bits_id)
    id_mask = jnp.int32((1 << bits_id) - 1)
    sentinel = jnp.int32(0x7FFFFFFF)

    osx, osy, osz = ox - cx, oy - cy, oz - cz
    invx = 1.0 / jnp.where(dx == 0.0, 1e-20, dx)
    invy = 1.0 / jnp.where(dy == 0.0, 1e-20, dy)
    invz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)

    def slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
        t1x, t2x = (lo_x - osx) * invx, (hi_x - osx) * invx
        t1y, t2y = (lo_y - osy) * invy, (hi_y - osy) * invy
        t1z, t2z = (lo_z - osz) * invz, (hi_z - osz) * invz
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        return tlo, thi

    # Per-ray BVH-root test (root_hit_mask, k=2 widen) from the tile
    # envelope -- static scalar reductions over the [ct, 8] rows.
    r_lo = [aabb_rows[0, a] for a in range(3)]
    r_hi = [aabb_rows[0, 3 + a] for a in range(3)]
    for c in range(1, ct):
        for a in range(3):
            r_lo[a] = jnp.minimum(r_lo[a], aabb_rows[c, a])
            r_hi[a] = jnp.maximum(r_hi[a], aabb_rows[c, 3 + a])
    tlo_r, thi_r = slab(*r_lo, *r_hi)
    tlo_r, thi_r = _widen_slab(tlo_r, thi_r, k=2)
    root = (thi_r >= tlo_r) & (thi_r > 0.0) & (tlo_r < t_limit)
    livem = alive & root

    # Top-n_sig nearest candidate tiles by incremental sorted insertion of
    # the packed (coarse tlo bits | tile id) candidate, one tile at a time.
    tops = [jnp.full(osx.shape, sentinel, jnp.int32) for _ in range(n_sig)]
    for c in range(ct):
        tlo, thi = slab(
            aabb_rows[c, 0], aabb_rows[c, 1], aabb_rows[c, 2],
            aabb_rows[c, 3], aabb_rows[c, 4], aabb_rows[c, 5],
        )
        hit = (thi >= tlo) & (thi > 0.0) & (tlo < t_limit) & livem
        b = jax.lax.bitcast_convert_type(jnp.maximum(tlo, 0.0), jnp.int32)
        p = jnp.where(hit, (b & ~id_mask) | jnp.int32(c), sentinel)
        for k in range(n_sig):
            lo_k = jnp.minimum(tops[k], p)
            p = jnp.maximum(tops[k], p)
            tops[k] = lo_k

    sig = jnp.where(tops[0] == sentinel, id_mask, tops[0] & id_mask)
    for k in range(1, n_sig):
        idk = jnp.where(tops[k] == sentinel, id_mask, tops[k] & id_mask)
        sig = (sig << bits_id) | idk
    if dir_total >= 3:
        db = dir_total // 3
        dscale = (1 << db) - 1

        def qd(d):
            t = jnp.clip((d + 1.0) * 0.5, 0.0, 1.0)
            return (t * dscale).astype(jnp.int32)

        dmorton = (
            _morton_spread3(qd(dx))
            | (_morton_spread3(qd(dy)) << 1)
            | (_morton_spread3(qd(dz)) << 2)
        )
        sig = (sig << (3 * db)) | dmorton
    key = jnp.where(livem, sig, jnp.int32(1 << 30))
    return jnp.where(alive, key, jnp.int32((1 << 30) + 1))


# In-kernel coherence keys unroll a per-tile slab loop inside the fused
# shade kernel; past this tile count the unrolled loop's VPU cost exceeds
# the XLA key build it replaces (the XLA builder is chunked [N, 16] slab
# passes whose cost is flat-ish in ct).
KEY_INLINE_MAX_CT = 24


def coherence_perm(
    tables: MXUMeshTables,
    ro: Vec3,
    rd: Vec3,
    active: jnp.ndarray,
    t_limit: jnp.ndarray,
    sort_bits: int,
    sort_dir_bits: int,
    mode: str = "morton",
) -> jnp.ndarray:
    """Coherence-sort permutation for PERSISTENT sorting: callers permute
    the whole bounce state once (paths, uniforms, t_limit) and run every
    downstream stage -- this kernel with ``sort_rays=False``, attr resolve,
    the fused shade -- in sorted order, never scattering back (the film
    scatter-adds by pixel id at iteration end).  Root-missing rays share the
    dead-ray sentinel key so they pack into skippable trailing blocks."""
    root = root_hit_mask(
        tables.tile_aabb, tables.center, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
        t_limit,
    )
    live = (active & root).astype(jnp.float32)
    c = tables.center
    if mode == "signature":
        key = _signature_keys(
            tables.tile_aabb,
            ro.x - c[0], ro.y - c[1], ro.z - c[2],
            rd.x, rd.y, rd.z, live, t_limit,
        )
    else:
        lo = jnp.min(tables.tile_aabb[:, 0:3], axis=0)
        hi = jnp.max(tables.tile_aabb[:, 3:6], axis=0)
        key = _coherence_keys(
            ro.x - c[0], ro.y - c[1], ro.z - c[2],
            rd.x, rd.y, rd.z, live, lo, hi, sort_bits, sort_dir_bits,
        )
    # Three-level key: live&root (signature/morton) < live&!root (prim-only
    # rays, sentinel 1<<30 from the key fns) < dead.  Packing ALL alive rays
    # ahead of dead ones gives the fused bounce a tight alive prefix
    # (bounce_prefix_tiers); order within the trailing classes is
    # irrelevant to the kernel (their blocks are skipped either way).
    key = jnp.where(active, key, jnp.int32((1 << 30) + 1))
    # A packed single-operand sort ((key << 20) | lane when the key fits)
    # was measured on hardware at 173.04 vs 173.14 ms/frame -- the argsort
    # is NOT a bottleneck (XLA's (key, iota) sort is already cheap at 640k);
    # keep the simple form.
    return jnp.argsort(key)


def _intersect_kernel(
    baby_eps: float,
    num_groups: int,
    # refs
    rayf_ref,  # [RAY_TILE, NUM_F] ray features (o already recentered)
    tlim_ref,  # [RAY_TILE, 1]
    feat_ref,  # [NUM_F, 4*Tp] FULL feature table (VMEM-resident)
    aabb_ref,  # [Cf, 8] fine-tile bounds table
    gaabb_ref,  # [Cg, 8] coarse-group bounds table
    out_t_ref,  # [RAY_TILE, 1]
    out_tri_ref,  # [RAY_TILE, 1] i32
):
    """Finds (closest t, triangle id) per ray.  The winner's (u, v) are NOT
    tracked here -- they are recomputed per ray outside the kernel from the
    attrs table (``winner_uv``), which removes two masked pick-reductions
    from this epilogue (the kernel is VPU-epilogue-bound, not MXU-bound).

    Cull is two-level: a coarse slab test per GROUP_TRIS-triangle group
    (one cond skips GROUP_TILES fine tiles), then a fine slab test per
    TRI_TILE-triangle matmul tile.  With coherence-sorted ray blocks most
    fine tiles miss, and the per-candidate epilogue -- the kernel's real
    cost -- runs on ~an order of magnitude fewer triangles."""
    rayf = rayf_ref[:]
    d = rayf[:, 0:3]
    o = rayf[:, 6:9]
    tlim = tlim_ref[:]
    inv = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
    # Inactive rays have all-zero features (feature 9 is the constant 1);
    # a fully-dead block (common in late bounces) skips the tri loop.
    block_live = jnp.any(rayf[:, 9] > 0.0)

    def slab_any(ref, i, best_t):
        """Does ANY ray in the block enter AABB row i closer than its best?
        (group-level visit cull only -- candidates are defined per ray by
        ``_member_slab`` at the tile level)"""
        row = ref[pl.ds(i, 1), :]  # [1, 8]
        t1 = (row[:, 0:3] - o) * inv
        t2 = (row[:, 3:6] - o) * inv
        tlo = jnp.max(jnp.minimum(t1, t2), axis=1, keepdims=True)
        thi = jnp.min(jnp.maximum(t1, t2), axis=1, keepdims=True)
        tlo, thi = _widen_slab(tlo, thi)
        return jnp.any((thi >= tlo) & (thi > 0.0) & (tlo <= best_t))

    def tile_body(c, carry):
        # Per-ray candidate test (the module contract): a ray only accepts
        # hits from tiles ITS OWN slab test passes, with t inside the
        # widened interval -- so results never depend on which blockmate
        # kept a tile alive, and near-degenerate f32 false positives
        # (t outside the interval) are rejected identically in every
        # traversal.
        row = aabb_ref[pl.ds(c, 1), :]
        member, s_tlo, s_thi = _member_slab(row, o, inv, tlim)
        # Fused per-ray candidate bounds: tt > baby_eps AND tt >= tlo AND
        # member collapse into ONE lower bound per ray (tt > e  <=>
        # tt >= nextafter(e) for f32 tt), and non-member rays get an empty
        # [inf, -inf] interval -- the contract's masking at the cost of a
        # single extra compare+and on the wide epilogue.
        eps_succ = float(np.nextafter(np.float32(baby_eps), np.float32(np.inf)))
        t_lo = jnp.where(member, jnp.maximum(s_tlo, eps_succ), jnp.inf)
        t_hi = jnp.where(member, s_thi, -jnp.inf)

        def live(carry):
            best_t, best_tri = carry
            cols = pl.ds(pl.multiple_of(c * (4 * TRI_TILE), 4 * TRI_TILE), 4 * TRI_TILE)
            quad = jnp.dot(
                rayf, feat_ref[:, cols], preferred_element_type=jnp.float32
            )  # [R, 4*T]: four contiguous T-wide blocks (see build_mxu_tables)
            # Division-free barycentric bounds (_mt_hit): u = u_num/det in
            # [0,1] iff u_num*sign(det) in [0, |det|] (det != 0 under
            # det_ok).  u <= 1 is implied by v >= 0 and u + v <= 1, so it
            # is not tested (the reference tests the same three bounds).
            hit, tt = _mt_hit(quad, t_lo, t_hi, baby_eps)
            # Sentinel must compare >= any t_limit (callers pass FLT_MAX).
            # No tt < best_t mask needed: the row-min + `better` comparison
            # below rejects any candidate at or past the running best.
            ttm = jnp.where(hit, tt, jnp.inf)
            row_min = jnp.min(ttm, axis=1, keepdims=True)  # [R, 1]
            better = row_min < best_t
            # lowest lane achieving the min (min-reductions only; no argmin)
            lane_masked = jnp.where(ttm <= row_min, lane, TRI_TILE)
            kbest = jnp.min(lane_masked, axis=1, keepdims=True)  # [R, 1]
            return (
                jnp.where(better, row_min, best_t),
                jnp.where(better, c * TRI_TILE + kbest, best_tri),
            )

        if not USE_TILE_CULL:
            return live(carry)
        # <= (not <): a candidate with tlo == best could still tie at
        # t == best, and the tie must resolve by lowest triangle id in
        # every path -- so tie tiles are visited here exactly as the
        # planned walk's strict-> early exit visits them.
        any_hit = jnp.any(member & (s_tlo <= carry[0]))
        return jax.lax.cond(any_hit, live, lambda cr: cr, carry)

    def group_body(g, carry):
        if GROUP_TILES == 1 or not USE_TILE_CULL:
            # degenerate hierarchy: group == tile; skip the coarse level
            return tile_body(g, carry)

        def glive(carry):
            return jax.lax.fori_loop(
                0,
                GROUP_TILES,
                lambda k, cr: tile_body(g * GROUP_TILES + k, cr),
                carry,
            )

        any_g = slab_any(gaabb_ref, g, carry[0])
        return jax.lax.cond(any_g, glive, lambda cr: cr, carry)

    shape = (RAY_TILE, 1)
    init = (
        tlim_ref[:],
        jnp.full(shape, -1, jnp.int32),
    )
    n_outer = num_groups if (GROUP_TILES > 1 and USE_TILE_CULL) else (
        num_groups * GROUP_TILES
    )
    best_t, best_tri = jax.lax.cond(
        block_live,
        lambda cr: jax.lax.fori_loop(0, n_outer, group_body, cr),
        lambda cr: cr,
        init,
    )
    out_t_ref[:] = best_t
    out_tri_ref[:] = best_tri


def _build_tile_plan(tile_aabb, o, d, one, tl):
    """Front-to-back per-block tile plan (XLA, elementwise + row sorts).

    For every (256-ray block, TRI_TILE tile) pair, an exact per-ray slab
    test decides whether ANY live ray in the block can enter the tile's
    AABB closer than its t_limit; hit tiles are ordered by the block's
    minimum entry distance (clamped at 0 -- every reported hit t is
    positive, so max(tlo, 0) is still a valid lower bound on any t the
    tile can produce).  Returns (ids [NB*Ct] i32, tlo [NB*Ct] f32 sorted
    ascending with +inf for misses, cnt [NB] i32) for scalar prefetch.

    This is the BVH's *ordered* descent re-expressed for blocks: visiting
    near tiles first collapses best_t immediately, so the kernel's early
    exit fires after the first-hit shell instead of sweeping every
    overlapped tile (measured 61/79 tiles visited per live block on the
    80k mesh without ordering)."""
    n_pad = o.shape[0]
    nb = n_pad // RAY_TILE
    ct = tile_aabb.shape[0]
    invx = 1.0 / jnp.where(d[:, 0] == 0.0, 1e-20, d[:, 0])
    invy = 1.0 / jnp.where(d[:, 1] == 0.0, 1e-20, d[:, 1])
    invz = 1.0 / jnp.where(d[:, 2] == 0.0, 1e-20, d[:, 2])
    live = one > 0.0
    hs, ls = [], []
    TC = 16  # tile-chunked so [n_pad, TC] intermediates stay small
    for c0 in range(0, ct, TC):
        rows = tile_aabb[c0 : c0 + TC]
        lo, hi = rows[:, 0:3], rows[:, 3:6]
        t1x = (lo[None, :, 0] - o[:, None, 0]) * invx[:, None]
        t2x = (hi[None, :, 0] - o[:, None, 0]) * invx[:, None]
        t1y = (lo[None, :, 1] - o[:, None, 1]) * invy[:, None]
        t2y = (hi[None, :, 1] - o[:, None, 1]) * invy[:, None]
        t1z = (lo[None, :, 2] - o[:, None, 2]) * invz[:, None]
        t2z = (hi[None, :, 2] - o[:, None, 2]) * invz[:, None]
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        tlo, thi = _widen_slab(tlo, thi, k=2)
        h = (thi >= tlo) & (thi > 0.0) & (tlo < tl[:, None]) & live[:, None]
        tc = rows.shape[0]
        hb = h.reshape(nb, RAY_TILE, tc).any(axis=1)
        per_ray = jnp.where(h, jnp.maximum(tlo, 0.0), jnp.inf)
        lb = per_ray.reshape(nb, RAY_TILE, tc).min(axis=1)
        hs.append(hb)
        ls.append(lb)
    H = jnp.concatenate(hs, axis=1)  # [NB, Ct]
    key = jnp.where(H, jnp.concatenate(ls, axis=1), jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tlo_sorted = jnp.take_along_axis(key, order, axis=1)
    cnt = jnp.sum(H, axis=1).astype(jnp.int32)
    return order.reshape(-1), tlo_sorted.reshape(-1), cnt


def _build_tile_plan_frustum(tile_aabb, o, d, one, tl):
    """Block-FRUSTUM tile plan: ``_build_tile_plan``'s API at ~1/RAY_TILE of
    its cost, via interval arithmetic on per-block ray envelopes.

    The exact plan's per-(ray, tile) slab sweep is O(N*Ct) with [N, 16]
    f32 intermediates -- measured 3.6 ms/bounce at 640k rays even at FIVE
    tiles (the pass is HBM-intermediate-bound, not flop-bound).  But with
    the coherence sort on, a block's 256 rays share a tight (origin box,
    direction cone) frustum, so ONE interval slab test per (block, tile)
    pair -- O(NB*Ct), a few thousand rows -- bounds every member ray's
    entry/exit interval at once:

      per-ray   tlo = max_axis min(t1, t2)  >=  max_axis lower(t1I, t2I)
      per-ray   thi = min_axis max(t1, t2)  <=  min_axis upper(t1I, t2I)

    where t1I/t2I are interval products of (bound - origin-interval) with
    the direction-reciprocal interval.  Axes whose direction interval
    straddles 0 contribute (-inf, +inf) -- fully conservative.  The
    resulting (candidate set, entry lower bound) is therefore a SUPERSET /
    true lower bound of the exact plan's for every live member ray, which
    is all the candidate-set contract requires (supersets are speed, never
    correctness; the kernels' per-ray member test still gates every
    evaluation, so results stay bit-identical BY CONSTRUCTION).  k=2
    widening as for every XLA-side cull, plus the same max(tlo, 0) clamp.

    Unsorted ray states remain correct but their envelopes are scene-wide
    (the plan admits ~every tile): callers enable this only on coherence-
    sorted populations (``plan_mode="auto"``)."""
    n_pad = o.shape[0]
    nb = n_pad // RAY_TILE
    ct = tile_aabb.shape[0]
    big = jnp.float32(3.0e38)
    live = (one > 0.0).reshape(nb, RAY_TILE, 1)
    om = o.reshape(nb, RAY_TILE, 3)
    dm = d.reshape(nb, RAY_TILE, 3)
    o_lo = jnp.min(jnp.where(live, om, big), axis=1)  # [nb, 3]
    o_hi = jnp.max(jnp.where(live, om, -big), axis=1)
    d_lo = jnp.min(jnp.where(live, dm, big), axis=1)
    d_hi = jnp.max(jnp.where(live, dm, -big), axis=1)
    tl_hi = jnp.max(
        jnp.where(live[:, :, 0], tl.reshape(nb, RAY_TILE), -big), axis=1
    )  # [nb]
    has_live = jnp.any(live[:, :, 0], axis=1)  # [nb]

    # Direction-reciprocal interval per (block, axis).  Same-sign intervals
    # invert cleanly; sign-straddling (or zero-touching) axes get the
    # conservative (-inf, inf) -- jnp.where keeps the inf arithmetic out of
    # the same-sign path.  (Per-ray code maps d==0 to 1/1e-20 > 0, which the
    # straddle branch dominates.)
    same = (d_lo > 0.0) | (d_hi < 0.0)
    safe_lo = jnp.where(same, d_lo, 1.0)
    safe_hi = jnp.where(same, d_hi, 1.0)
    i0 = jnp.where(same, 1.0 / safe_hi, -big)  # [nb, 3]
    i1 = jnp.where(same, 1.0 / safe_lo, big)
    i_lo = jnp.minimum(i0, i1)
    i_hi = jnp.maximum(i0, i1)

    def islab(bound):  # bound [ct, 3] -> (t_lo [nb, ct, 3], t_hi)
        u_lo = bound[None, :, :] - o_hi[:, None, :]  # [nb, ct, 3]
        u_hi = bound[None, :, :] - o_lo[:, None, :]
        p1 = u_lo * i_lo[:, None, :]
        p2 = u_lo * i_hi[:, None, :]
        p3 = u_hi * i_lo[:, None, :]
        p4 = u_hi * i_hi[:, None, :]
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    t1_lo, t1_hi = islab(tile_aabb[:, 0:3])
    t2_lo, t2_hi = islab(tile_aabb[:, 3:6])
    ta_lo = jnp.minimum(t1_lo, t2_lo)  # lower hull of per-ray min(t1, t2)
    tb_hi = jnp.maximum(t1_hi, t2_hi)  # upper hull of per-ray max(t1, t2)
    tlo = jnp.max(ta_lo, axis=2)  # [nb, ct] lower bound of per-ray entry
    thi = jnp.min(tb_hi, axis=2)  # upper bound of per-ray exit
    tlo, thi = _widen_slab(tlo, thi, k=2)
    h = (
        (thi >= tlo) & (thi > 0.0)
        & (tlo < tl_hi[:, None]) & has_live[:, None]
    )
    key = jnp.where(h, jnp.maximum(tlo, 0.0), jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tlo_sorted = jnp.take_along_axis(key, order, axis=1)
    cnt = jnp.sum(h, axis=1).astype(jnp.int32)
    return order.reshape(-1), tlo_sorted.reshape(-1), cnt


def _plan_prepass_kernel(rayf_ref, tlim_ref, aabbt_ref, h_ref, lb_ref):
    """Per-block exact slab plan, rays VMEM-resident (see the builder)."""
    rayf = rayf_ref[:]
    o = rayf[:, 6:9]
    dvec = rayf[:, 0:3]
    inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
    live = rayf[:, 9:10] > 0.0  # [R, 1]
    tl = tlim_ref[:]  # [R, 1]

    def axis(a):
        lo = aabbt_ref[a : a + 1, :]  # [1, Ctp]
        hi = aabbt_ref[3 + a : 4 + a, :]
        t1 = (lo - o[:, a : a + 1]) * inv[:, a : a + 1]  # [R, Ctp]
        t2 = (hi - o[:, a : a + 1]) * inv[:, a : a + 1]
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    n0, x0 = axis(0)
    n1, x1 = axis(1)
    n2, x2 = axis(2)
    tlo = jnp.maximum(jnp.maximum(n0, n1), n2)
    thi = jnp.minimum(jnp.minimum(x0, x1), x2)
    tlo, thi = _widen_slab(tlo, thi, k=2)
    h = (thi >= tlo) & (thi > 0.0) & (tlo < tl) & live
    h_ref[:] = jnp.max(h.astype(jnp.float32), axis=0, keepdims=True)
    per = jnp.where(h, jnp.maximum(tlo, 0.0), jnp.inf)
    lb_ref[:] = jnp.min(per, axis=0, keepdims=True)


def _build_tile_plan_pallas(tile_aabb, rayf, tlim, interpret=False):
    """``_build_tile_plan`` with the per-(ray, tile) sweep as a Pallas
    kernel: each 256-ray block stays VMEM-resident and broadcasts over ALL
    tiles at once, so HBM traffic is read-rays-ONCE + write [NB, Ctp] --
    independent of the tile count.  The XLA sweep's traffic is O(N*Ct)
    [n, 16] intermediates (measured 3.6 ms/bounce at 640k rays and just
    FIVE tiles; the 500k mesh has 489 tiles).  Same widened-slab test and
    key arithmetic (identical op order), so the (ids, tlo, cnt) plan is
    bit-identical to the XLA builder's -- asserted cross-impl in
    tests/test_plan_pallas.py; results are additionally covered by the
    per-ray candidate contract.  AABBs ride transposed [8, Ctp] so tile
    bounds broadcast along lanes (Mosaic cannot broadcast a VMEM scalar
    at a lane offset)."""
    n_pad = rayf.shape[0]
    nb = n_pad // RAY_TILE
    ct = tile_aabb.shape[0]
    ct_pad = max(128, ((ct + 127) // 128) * 128)
    big = jnp.float32(3.0e38)
    # pad with never-hit boxes (lo=+big, hi=-big)
    pad_rows = jnp.concatenate(
        [jnp.full((ct_pad - ct, 3), big), jnp.full((ct_pad - ct, 5), -big)],
        axis=1,
    )
    aabbt = jnp.concatenate([tile_aabb, pad_rows], axis=0).T  # [8, Ctp]
    h, lb = pl.pallas_call(
        _plan_prepass_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, NUM_F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ct_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ct_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, ct_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb, ct_pad), jnp.float32),
        ),
        interpret=interpret,
    )(rayf, tlim, aabbt)
    H = h[:, :ct] > 0.0
    key = jnp.where(H, lb[:, :ct], jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tlo_sorted = jnp.take_along_axis(key, order, axis=1)
    cnt = jnp.sum(H, axis=1).astype(jnp.int32)
    return order.reshape(-1), tlo_sorted.reshape(-1), cnt


def _plan_with_prefix(
    aabb_c, rayf_c, tlim_c, frustum: bool = False, impl: str = "xla",
    interpret: bool = False,
):
    """``_build_tile_plan`` restricted to the live-ray prefix when possible.

    The plan's per-(ray, tile) slab sweep is O(N*Ct) but most bounce rays
    are dead or root-culled (measured 70-90%), and the coherence sort packs
    them behind the live rays (dead-ray sentinel keys).  When the LAST live
    ray sits inside a 1/16 or 1/4 prefix (checked on device -- exact even
    with a stale persistent sort order, since rays only die), the sweep
    runs on that prefix only and the trailing blocks get empty plans
    (cnt=0), which the kernels already skip.  Bit-identical by
    construction: rays outside the prefix are dead and have no candidates.
    """
    ct = aabb_c.shape[0]
    n_pad_l = rayf_c.shape[0]
    nb = n_pad_l // RAY_TILE

    def run_plan(rayf_s, tlim_s):
        if impl == "pallas" and not frustum:
            return _build_tile_plan_pallas(
                aabb_c, rayf_s, tlim_s, interpret=interpret
            )
        builder = _build_tile_plan_frustum if frustum else _build_tile_plan
        return builder(
            aabb_c, rayf_s[:, 6:9], rayf_s[:, 0:3], rayf_s[:, 9],
            tlim_s[:, 0],
        )

    def full(_):
        return run_plan(rayf_c, tlim_c)

    if nb < 8 or frustum:
        # Tiny ray counts (tests) have nothing to prefix; the frustum plan
        # is O(NB*Ct) + one envelope reduction, already ~free -- dead
        # blocks yield cnt=0 through has_live without prefix machinery.
        return full(None)

    live_pos = jnp.max(
        jnp.where(
            rayf_c[:, 9] > 0.0,
            jax.lax.iota(jnp.int32, n_pad_l),
            -1,
        )
    )

    def at(npre):
        nbp = npre // RAY_TILE

        def f(_):
            ids, tlo, cnt = run_plan(rayf_c[:npre], tlim_c[:npre])
            ids = jnp.concatenate(
                [ids.reshape(nbp, ct), jnp.zeros((nb - nbp, ct), jnp.int32)]
            ).reshape(-1)
            tlo = jnp.concatenate(
                [tlo.reshape(nbp, ct),
                 jnp.full((nb - nbp, ct), jnp.inf, jnp.float32)]
            ).reshape(-1)
            cnt = jnp.concatenate([cnt, jnp.zeros((nb - nbp,), jnp.int32)])
            return ids, tlo, cnt

        return f

    p4 = (nb // 4) * RAY_TILE
    p16 = (nb // 16) * RAY_TILE
    out = full
    if 0 < p4 < n_pad_l:
        lvl4, prev4 = at(p4), out
        out = lambda _: jax.lax.cond(live_pos < p4, lvl4, prev4, None)
    if 0 < p16 < p4:
        lvl16, prev16 = at(p16), out
        out = lambda _: jax.lax.cond(live_pos < p16, lvl16, prev16, None)
    return out(None)


def _mt_hit(quad, t_lo, t_hi, baby_eps):
    """Moller-Trumbore acceptance over one [R, 4*TRI_TILE] quad block ->
    (hit, tt).  ONE definition shared by EVERY kernel (sweep / planned /
    lanebest / streamed / binned / mono), so the cross-traversal
    bit-identity contract rests on a single expression graph.

    The kernels are VPU-epilogue-bound (~0.14 us per full-width op,
    round-5 profile), so the textbook sign-flip form is trimmed -- each
    rewrite PROVABLY preserves every comparison bit-for-bit:

    * ``us = u_num * s`` (s = +/-1 from det's sign) becomes an XOR of
      det's sign BIT into u_num: multiplication by +/-1.0 is exact in
      IEEE-754 and produces the identical bit pattern (incl. +/-0), so
      every downstream compare sees identical f32 values.  3 int ops
      replace cmp+select+2 muls.  (At det == -0.0 the sign BIT differs
      from the old ``det < 0`` test, but |det| < baby_eps forces
      hit = False there regardless, and us/vs feed nothing else.)
    * ``da = det * s == |det|`` reuses the abs already computed for
      det_ok.  At det == +/-0 the old form could give -0.0 vs abs'
      +0.0; ``us + vs <= da`` compares equal either way (-0.0 == +0.0).
    * ``(us >= 0) & (vs >= 0) == min(us, vs) >= 0``: us/vs are never NaN
      (finite features, no inf products), and IEEE min over +/-0 is
      >= 0 under either choice.

    Same epsilon semantics as the reference's ``intersectTriangle``
    (src/intersections.cu:112-145); the [t_lo, t_hi] confinement is the
    candidate-set contract (module docstring)."""
    det = quad[:, 0 * TRI_TILE : 1 * TRI_TILE]
    u_num = quad[:, 1 * TRI_TILE : 2 * TRI_TILE]
    v_num = quad[:, 2 * TRI_TILE : 3 * TRI_TILE]
    t_num = quad[:, 3 * TRI_TILE : 4 * TRI_TILE]
    abs_det = jnp.abs(det)
    det_ok = abs_det >= baby_eps
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tt = t_num * inv_det
    bc = jax.lax.bitcast_convert_type
    sign = bc(det, jnp.int32) & jnp.int32(-(2**31))
    us = bc(bc(u_num, jnp.int32) ^ sign, jnp.float32)
    vs = bc(bc(v_num, jnp.int32) ^ sign, jnp.float32)
    hit = (
        det_ok
        & (jnp.minimum(us, vs) >= 0.0)
        & (us + vs <= abs_det)
        & (tt >= t_lo)
        & (tt <= t_hi)
    )
    return hit, tt


def _mt_hit_legacy(quad, t_lo, t_hi, baby_eps):
    """The round-4 form of ``_mt_hit`` (sign-flip multiplies instead of
    bitcast/XOR), PROVABLY value-identical to it (see _mt_hit's rewrite
    proofs -- they are equalities, so they read in both directions).

    The HEAVY paths (streamed / binned walks) use this form: the round-5
    pinned campaign measured them 1.3-2.7x slower than the stable
    round-3/4 numbers (200k binned 527.7 -> 1410.5, 200k streamed
    917 -> 1180.6, 500k streamed 1669.9 -> 2409.2 ms; round-4-code
    same-session controls reproduce the old numbers exactly, so the
    regression is code-side) while the light paths improved -- the
    trimmed form's int bitcasts are implicated in those kernels'
    lowering.  mono / lanebest / sweep keep the trimmed ``_mt_hit``
    (measured wins: 5k 143.6 -> 133.6, 20k 287 -> 262.5).  Mixing forms
    is safe for the bit-identity contract precisely because the forms
    are value-identical."""
    det = quad[:, 0 * TRI_TILE : 1 * TRI_TILE]
    u_num = quad[:, 1 * TRI_TILE : 2 * TRI_TILE]
    v_num = quad[:, 2 * TRI_TILE : 3 * TRI_TILE]
    t_num = quad[:, 3 * TRI_TILE : 4 * TRI_TILE]
    det_ok = jnp.abs(det) >= baby_eps
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tt = t_num * inv_det
    s = jnp.where(det < 0.0, -1.0, 1.0)
    us = u_num * s
    vs = v_num * s
    da = det * s
    hit = (
        det_ok
        & (us >= 0.0)
        & (vs >= 0.0)
        & (us + vs <= da)
        & (tt >= t_lo)
        & (tt <= t_hi)
    )
    return hit, tt


def _walk_quad_epilogue(
    rayf, feat_block, baby_eps, lane, tile_id, t_lo, t_hi, best_t, best_tri
):
    """Shared Moller-Trumbore quad epilogue of the ordered walks
    (planned/streamed): evaluate ONE feature tile against the block and
    fold in winners under the strict-improvement / lowest-triangle-id
    rule.  One definition keeps the cross-traversal bit-identity contract
    in one place (the sweep kernel's epilogue is deliberately separate:
    its ascending visit order lets it skip the tie bookkeeping).

    Acceptance uses ``_mt_hit_legacy`` -- the round-4 expression graph --
    NOT the trimmed ``_mt_hit``: the round-5 heavy-band regression
    (200k streamed 917 -> 1180, 500k 1672 -> 2409 ms, same-session
    round-4-code controls) implicates the round-5 heavy-path changes, and
    the two forms are PROVABLY value-identical (see _mt_hit), so the
    measured-safe graph ships on the heavy paths while mono/lanebest keep
    their measured round-5 wins."""
    quad = jnp.dot(rayf, feat_block, preferred_element_type=jnp.float32)
    hit, tt = _mt_hit_legacy(quad, t_lo, t_hi, baby_eps)
    ttm = jnp.where(hit, tt, jnp.inf)
    row_min = jnp.min(ttm, axis=1, keepdims=True)
    better = row_min < best_t
    tie = row_min == best_t

    def update(args):
        best_t, best_tri = args
        lane_masked = jnp.where(ttm <= row_min, lane, TRI_TILE)
        kbest = jnp.min(lane_masked, axis=1, keepdims=True)
        cand = tile_id * TRI_TILE + kbest
        new_tri = jnp.where(
            better,
            cand,
            jnp.where(tie, jnp.minimum(best_tri, cand), best_tri),
        )
        return jnp.where(better, row_min, best_t), new_tri

    # argmin bookkeeping (2 more full-width passes) only when some ray
    # actually improved or tied
    return jax.lax.cond(
        jnp.any(better | (tie & (row_min < jnp.inf))),
        update, lambda a: a, (best_t, best_tri),
    )


def _planned_kernel(
    baby_eps: float,
    ct: int,
    # scalar prefetch (SMEM, dynamically indexable)
    ids_ref,  # [NB * Ct] i32 tile ids, front-to-back per block
    tlo_ref,  # [NB * Ct] f32 block-min entry distance (inf = miss)
    cnt_ref,  # [NB] i32 candidate count
    # tensor refs
    rayf_ref,  # [RAY_TILE, NUM_F]
    tlim_ref,  # [RAY_TILE, 1]
    feat_ref,  # [NUM_F, 4*Tp] full chunk table in VMEM
    aabb_ref,  # [Ct, 8] tile bounds (per-ray member test)
    out_t_ref,
    out_tri_ref,
):
    """Ordered block-sparse traversal: walk this block's candidate tiles
    front-to-back, maintain the running closest hit, and stop as soon as
    the next tile's entry distance can't beat ANY ray's best (tlo ascending
    + conservative bound => exact).  Winner selection is visit-order
    independent: per-ray candidate membership (``_member_slab``, module
    contract), strict improvement wins, exact ties resolve to the lowest
    triangle id (the sweep kernel's ascending order implies the same), so
    results are bit-identical to ``_intersect_kernel``."""
    b = pl.program_id(0)
    rayf = rayf_ref[:]
    o = rayf[:, 6:9]
    dvec = rayf[:, 0:3]
    inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
    cnt = cnt_ref[b]
    init_t = tlim_ref[:]
    init_tri = jnp.full((RAY_TILE, 1), -1, jnp.int32)
    # Dead/root-missing rays (zero features) can never hit: exclude their
    # (padded-huge) t_limit from the early-exit bound.  Their outputs stay
    # (t_limit, -1) either way, so this is exact.
    live_col = rayf[:, 9:10] > 0.0

    def live_max(best_t):
        return jnp.max(jnp.where(live_col, best_t, 0.0))

    def cond(carry):
        t, _, _, _, done = carry
        return (t < cnt) & jnp.logical_not(done)

    def body(carry):
        t, best_t, best_tri, mb, _ = carry
        tile_tlo = tlo_ref[b * ct + t]
        # STRICT >: any t this tile can produce is >= tile_tlo, so
        # tile_tlo > mb implies strictly-worse for every ray -- no better
        # hits AND no exact ties (which tie-min would have to resolve).
        stop = tile_tlo > mb

        def run(args):
            best_t, best_tri = args
            tile_id = ids_ref[b * ct + t]
            row = aabb_ref[pl.ds(tile_id, 1), :]
            member, s_tlo, s_thi = _member_slab(row, o, inv, tlim_ref[:])
            eps_succ = float(
                np.nextafter(np.float32(baby_eps), np.float32(np.inf))
            )
            t_lo = jnp.where(member, jnp.maximum(s_tlo, eps_succ), jnp.inf)
            t_hi = jnp.where(member, s_thi, -jnp.inf)
            # Per-visit improvability gate: the plan's early exit only
            # bounds the FRONT of the walk (tlo ascending vs the block
            # max); mid-walk, a tile can be skippable for every ray (its
            # members already hold closer hits).  <=: exact ties must be
            # evaluated (lowest-id rule).  Skipping is exact: a member's
            # candidate t is >= its own widened tlo.  Dead/root-culled
            # rays MUST be masked: their zeroed features slab-pass every
            # tile with s_tlo ~ -1e20 against an untouched (huge) t_limit,
            # which would make every mixed live/dead block unskippable --
            # and they cannot hit anyway (zero features give det = 0).
            improvable = jnp.any(live_col & member & (s_tlo <= best_t))

            def quad_epilogue(args):
                best_t, best_tri = args
                cols = pl.ds(
                    pl.multiple_of(tile_id * (4 * TRI_TILE), 4 * TRI_TILE),
                    4 * TRI_TILE,
                )
                return _walk_quad_epilogue(
                    rayf, feat_ref[:, cols], baby_eps, lane, tile_id,
                    t_lo, t_hi, best_t, best_tri,
                )

            return jax.lax.cond(
                improvable, quad_epilogue, lambda a: a, (best_t, best_tri)
            )

        best_t, best_tri = jax.lax.cond(stop, lambda a: a, run, (best_t, best_tri))
        return t + 1, best_t, best_tri, live_max(best_t), stop

    _, best_t, best_tri, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_t, init_tri, live_max(init_t), False)
    )
    out_t_ref[:] = best_t
    out_tri_ref[:] = best_tri


def _planned_kernel_lanebest(
    baby_eps: float,
    ct: int,
    # scalar prefetch (SMEM)
    ids_ref,  # [NB * Ct] i32 tile ids, front-to-back per block
    tlo_ref,  # [NB * Ct] f32 (unused here; layout shared with _planned_kernel)
    cnt_ref,  # [NB] i32 candidate count
    # tensor refs
    rayf_ref,
    tlim_ref,
    feat_ref,
    aabb_ref,
    out_t_ref,
    out_tri_ref,
):
    """Planned walk with LANE-BEST accumulation: each of the TRI_TILE
    lanes keeps its own running (min t, min tile-on-tie) across visits,
    and the cross-lane winner -- exact (min t, lowest global tri on tie),
    the candidate-contract rule -- resolves ONCE after the walk.

    Why: the per-visit epilogue dominates the planned kernel (measured
    ~7 us/visit at 5k tiles vs ~0.24 us of MXU matmul), and a third of it
    is winner bookkeeping (full-width row-min + cond'd argmin + improve/
    tie logic).  Lane-best replaces all of that with two cheap
    where-updates per visit.  The price is the mid-walk early exit and
    improvability gate (both need a per-ray running best) -- a good trade
    exactly when the plan is already candidate-tight: at 5k the plan
    visits 1587 blocks-tiles vs a 1294 per-ray-candidate floor, so exits
    could save at most ~18% of visits while the bookkeeping costs ~35%
    of every visit.  Gated to small tile counts (the [R, T] f32+i32
    accumulators add ~2 MB VMEM).  Bit-identical to every other
    traversal by the contract (same member test, same quad arithmetic,
    same winner rule -- asserted in tests)."""
    b = pl.program_id(0)
    rayf = rayf_ref[:]
    o = rayf[:, 6:9]
    dvec = rayf[:, 0:3]
    inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
    cnt = cnt_ref[b]
    eps_succ = float(np.nextafter(np.float32(baby_eps), np.float32(np.inf)))
    tlim = tlim_ref[:]

    def body(t, carry):
        lane_t, lane_tile = carry
        tile_id = ids_ref[b * ct + t]
        row = aabb_ref[pl.ds(tile_id, 1), :]
        member, s_tlo, s_thi = _member_slab(row, o, inv, tlim)
        t_lo = jnp.where(member, jnp.maximum(s_tlo, eps_succ), jnp.inf)
        t_hi = jnp.where(member, s_thi, -jnp.inf)
        cols = pl.ds(
            pl.multiple_of(tile_id * (4 * TRI_TILE), 4 * TRI_TILE),
            4 * TRI_TILE,
        )
        # The shared _mt_hit keeps this EXPRESSION-IDENTICAL to every other
        # kernel's acceptance: a value-equivalent reordering (det_ok from
        # det*s) once measured 1-ulp winner flips vs the other kernels --
        # the compiler's FMA/contraction choices are only stable for the
        # exact same graph, so the graph lives in exactly one place.
        quad = jnp.dot(
            rayf, feat_ref[:, cols], preferred_element_type=jnp.float32
        )
        hit, tt = _mt_hit(quad, t_lo, t_hi, baby_eps)
        cand = jnp.where(hit, tt, jnp.inf)
        upd = (cand < lane_t) | (
            (cand == lane_t) & (cand < jnp.inf) & (tile_id < lane_tile)
        )
        return (
            jnp.where(upd, cand, lane_t),
            jnp.where(upd, tile_id, lane_tile),
        )

    lane_t, lane_tile = jax.lax.fori_loop(
        0, cnt,
        body,
        (
            jnp.full((RAY_TILE, TRI_TILE), jnp.inf, jnp.float32),
            jnp.full((RAY_TILE, TRI_TILE), jnp.int32(1 << 30), jnp.int32),
        ),
    )

    # End-of-walk resolve: strict improvement over t_limit, lowest global
    # triangle id among exact-t ties (lane_tile already holds the lowest
    # tile per lane, so tile*T + lane ordering is the global tri order).
    row_min = jnp.min(lane_t, axis=1, keepdims=True)
    hitrow = row_min < tlim
    tri_lane = lane_tile * TRI_TILE + lane
    masked = jnp.where(lane_t <= row_min, tri_lane, jnp.int32(0x7FFFFFFF))
    tri = jnp.min(masked, axis=1, keepdims=True)
    out_t_ref[:] = jnp.where(hitrow, row_min, tlim)
    out_tri_ref[:] = jnp.where(hitrow, tri, -1)


def _mono_kernel(
    baby_eps: float,
    ct: int,
    rayf_ref,  # [RAY_TILE, NUM_F]
    tlim_ref,  # [RAY_TILE, 1]
    feat_ref,  # [NUM_F, 4*Tp] full table in VMEM
    aabb_ref,  # [Ct, 8]
    out_t_ref,
    out_tri_ref,
):
    """Plan-FREE traversal for tiny meshes: statically unroll EVERY tile,
    lane-best accumulate with a strict-< update, skip only fully-dead
    blocks.

    Why this beats the planned walk when Ct is small (round-5 epilogue
    profile, 5k mesh mid-bounce, 640k rays): the fori_loop + SMEM id read
    + dynamic feature slice costs ~2 us/visit on top of the ~0.24 us
    matmul (lb_mm floor 2.78 us/visit vs mono_mm 1.51), and a per-tile
    any(member) cond costs MORE than the work it skips (mono_gate 13.6 ms
    vs mono 10.8).  Straight-line static slices let Mosaic pipeline tile
    c+1's matmul under tile c's epilogue, so sweeping ALL 2675
    live-block tile pairs (10.8 ms) undercuts walking the plan's 1818
    candidates (11.2-11.6 ms) -- AND the XLA plan prepass + row sort
    disappear from the bounce entirely.

    Bit-identity (candidate contract): ascending tile order + strict-<
    makes first-win == lowest-tile-on-tie, per-lane lowest tile + cross-
    lane lowest (tile*T + lane) == lowest global triangle id; per-ray
    member windows confine hits exactly as every other kernel."""
    rayf = rayf_ref[:]
    o = rayf[:, 6:9]
    dvec = rayf[:, 0:3]
    inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
    tlim = tlim_ref[:]
    block_live = jnp.any(rayf[:, 9:10] > 0.0)
    eps_succ = float(np.nextafter(np.float32(baby_eps), np.float32(np.inf)))

    @pl.when(block_live)
    def _():
        lane_t = jnp.full((RAY_TILE, TRI_TILE), jnp.inf, jnp.float32)
        lane_tile = jnp.full(
            (RAY_TILE, TRI_TILE), jnp.int32(1 << 30), jnp.int32
        )
        for c in range(ct):
            row = aabb_ref[c : c + 1, :]
            member, s_tlo, s_thi = _member_slab(row, o, inv, tlim)
            t_lo = jnp.where(member, jnp.maximum(s_tlo, eps_succ), jnp.inf)
            t_hi = jnp.where(member, s_thi, -jnp.inf)
            quad = jnp.dot(
                rayf,
                feat_ref[:, c * 4 * TRI_TILE : (c + 1) * 4 * TRI_TILE],
                preferred_element_type=jnp.float32,
            )
            hit, tt = _mt_hit(quad, t_lo, t_hi, baby_eps)
            cand = jnp.where(hit, tt, jnp.inf)
            upd = cand < lane_t
            lane_t = jnp.where(upd, cand, lane_t)
            lane_tile = jnp.where(upd, jnp.int32(c), lane_tile)
        # End-of-walk resolve == _planned_kernel_lanebest's.
        row_min = jnp.min(lane_t, axis=1, keepdims=True)
        hitrow = row_min < tlim
        tri_lane = lane_tile * TRI_TILE + lane
        masked = jnp.where(
            lane_t <= row_min, tri_lane, jnp.int32(0x7FFFFFFF)
        )
        tri = jnp.min(masked, axis=1, keepdims=True)
        out_t_ref[:] = jnp.where(hitrow, row_min, tlim)
        out_tri_ref[:] = jnp.where(hitrow, tri, -1)

    @pl.when(jnp.logical_not(block_live))
    def _():
        out_t_ref[:] = tlim_ref[:]
        out_tri_ref[:] = jnp.full((RAY_TILE, 1), -1, jnp.int32)


def _streamed_kernel(
    baby_eps: float,
    ct: int,
    # scalar prefetch (SMEM)
    cnt_ref,  # [NB] i32 candidate count per block
    # tensor refs
    rayf_ref,  # [RAY_TILE, NUM_F] VMEM
    tlim_ref,  # [RAY_TILE, 1] VMEM
    aabb_ref,  # [Ct, 8] VMEM tile bounds (per-ray member test)
    feat_hbm,  # [NUM_F, 4*Tp] HBM (ANY): full feature table, streamed
    ids_hbm,  # [NB, 8, 128] i32 HBM: per-block tile ids, front-to-back
    tlo_hbm,  # [NB, 8, 128] f32 HBM: block-min entry distance, ascending
    out_t_ref,
    out_tri_ref,
    # scratch
    buf,  # VMEM (2, NUM_F, 4*TRI_TILE) double-buffered feature tiles
    ids_s,  # SMEM (8, 128) i32  (plan capacity 1024 tiles)
    tlo_s,  # SMEM (8, 128) f32
    feat_sem,  # DMA (2,)
    plan_sem,  # DMA (2,)
):
    """Single-call ordered traversal for ANY mesh size: candidate tiles'
    feature columns are DMA'd HBM->VMEM on demand (double-buffered, so the
    next tile's transfer overlaps the current tile's matmul+epilogue), and
    the early exit is GLOBAL front-to-back over all tiles -- unlike the
    chunked multi-call chain, whose fixed leaf-order chunking visits near
    tiles of far chunks before the running best can prune them, and which
    pays per-call dispatch + plan overhead per 32k triangles.

    Only visited tiles transfer (a skipped block moves zero feature bytes),
    so HBM traffic scales with the plan, not the mesh.  Results are
    bit-identical to the sweep kernel (same candidate arithmetic, same
    strict-improvement/lowest-id winner rule, same conservative bound)."""
    b = pl.program_id(0)
    rayf = rayf_ref[:]
    o = rayf[:, 6:9]
    dvec = rayf[:, 0:3]
    inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
    cnt = cnt_ref[b]
    init_t = tlim_ref[:]
    init_tri = jnp.full((RAY_TILE, 1), -1, jnp.int32)
    live_col = rayf[:, 9:10] > 0.0

    def live_max(best_t):
        return jnp.max(jnp.where(live_col, best_t, 0.0))

    @pl.when(cnt > 0)
    def _():
        # Fetch this block's plan row into SMEM (scalar-readable).
        ids_dma = pltpu.make_async_copy(ids_hbm.at[b], ids_s, plan_sem.at[0])
        tlo_dma = pltpu.make_async_copy(tlo_hbm.at[b], tlo_s, plan_sem.at[1])
        ids_dma.start()
        tlo_dma.start()
        ids_dma.wait()
        tlo_dma.wait()

        def feat_dma(slot, t):
            tile_id = ids_s[t // 128, t % 128]
            cols = pl.ds(
                pl.multiple_of(tile_id * (4 * TRI_TILE), 4 * TRI_TILE),
                4 * TRI_TILE,
            )
            return pltpu.make_async_copy(
                feat_hbm.at[:, cols], buf.at[slot], feat_sem.at[slot]
            )

        feat_dma(0, 0).start()

        def cond(carry):
            t, _, _, _, done = carry
            return (t < cnt) & jnp.logical_not(done)

        def body(carry):
            t, best_t, best_tri, mb, _ = carry
            # STRICT >: see _planned_kernel -- no better hits and no exact
            # ties past this point.  The DMA for tile t is in flight either
            # way and must be drained to keep semaphores balanced.
            stop = tlo_s[t // 128, t % 128] > mb
            slot = jax.lax.rem(t, 2)

            @pl.when(jnp.logical_not(stop) & (t + 1 < cnt))
            def _():
                feat_dma(jax.lax.rem(t + 1, 2), t + 1).start()

            feat_dma(slot, t).wait()

            def run(args):
                best_t, best_tri = args
                tile_id = ids_s[t // 128, t % 128]
                row = aabb_ref[pl.ds(tile_id, 1), :]
                member, s_tlo, s_thi = _member_slab(row, o, inv, tlim_ref[:])
                eps_succ = float(
                    np.nextafter(np.float32(baby_eps), np.float32(np.inf))
                )
                t_lo = jnp.where(
                    member, jnp.maximum(s_tlo, eps_succ), jnp.inf
                )
                t_hi = jnp.where(member, s_thi, -jnp.inf)
                # Mid-walk improvability gate (see _planned_kernel --
                # incl. the live mask: zero-feature rays slab-pass every
                # tile and would defeat the gate); the tile's DMA is
                # already drained either way.
                improvable = jnp.any(live_col & member & (s_tlo <= best_t))

                def quad_epilogue(args):
                    best_t, best_tri = args
                    return _walk_quad_epilogue(
                        rayf, buf[slot], baby_eps, lane, tile_id,
                        t_lo, t_hi, best_t, best_tri,
                    )

                return jax.lax.cond(
                    improvable, quad_epilogue, lambda a: a,
                    (best_t, best_tri),
                )

            best_t, best_tri = jax.lax.cond(
                stop, lambda a: a, run, (best_t, best_tri)
            )
            return t + 1, best_t, best_tri, live_max(best_t), stop

        _, best_t, best_tri, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init_t, init_tri, live_max(init_t), False)
        )
        out_t_ref[:] = best_t
        out_tri_ref[:] = best_tri

    @pl.when(cnt <= 0)
    def _():
        out_t_ref[:] = init_t
        out_tri_ref[:] = init_tri


def _streamed_super_kernel(
    baby_eps: float,
    cs: int,  # super-tile count
    ct: int,  # fine-tile count
    # scalar prefetch (SMEM)
    cnt_ref,  # [NB] i32 candidate SUPER count per block
    # tensor refs
    rayf_ref,  # [RAY_TILE, NUM_F] VMEM
    tlim_ref,  # [RAY_TILE, 1] VMEM
    aabb_ref,  # [Ct, 8] VMEM fine-tile bounds (per-ray member windows)
    saabb_ref,  # [Cs, 8] VMEM super-tile bounds (visit gate)
    feat_hbm,  # [NUM_F, 4*Tp] HBM (ANY)
    ids_hbm,  # [NB, 8, 128] i32 HBM: SUPER ids, front-to-back
    tlo_hbm,  # [NB, 8, 128] f32 HBM: super-entry lower bounds, ascending
    out_t_ref,
    out_tri_ref,
    # scratch
    buf,  # VMEM (2, NUM_F, SUPER_TILES*4*TRI_TILE) double-buffered supers
    ids_s,  # SMEM (8, 128)
    tlo_s,  # SMEM (8, 128)
    feat_sem,  # DMA (2,)
    plan_sem,  # DMA (2,)
):
    """Streamed walk at SUPER-tile granularity: one plan row, one DMA, one
    early-exit / improvability decision per SUPER_TILES contiguous tiles,
    with a STATIC inner unroll of the shared per-tile epilogue.

    Why (VERDICT round-4 #4, the flat 500k): at 489 tiles the per-visit
    walk machinery (fori step, SMEM reads, DMA bookkeeping, conds -- the
    same ~2 us/visit the round-5 epilogue profile isolated) and the
    O(N*Ct) plan prepass both scale with the tile count; grouping by
    SUPER_TILES divides both by 8 while the straight-line inner unroll
    pipelines like the mono kernel.  Supers are contiguous tile ranges in
    BVH-leaf order (spatially tight), and feature columns stay contiguous
    so a super is ONE [NUM_F, S*4*T] transfer.

    Exactness: the super plan is a candidate SUPERSET (super AABB contains
    each member tile's AABB, so tile-membership implies super-membership;
    k=2 plan widening as for every XLA cull), visits stay front-to-back by
    a true lower bound (super tlo <= member tile tlo <= any hit t), and
    every tile evaluation runs the SAME per-ray member window + _mt_hit +
    winner rule as every other kernel -- bit-identical by the candidate
    contract."""
    b = pl.program_id(0)
    s = SUPER_TILES
    rayf = rayf_ref[:]
    o = rayf[:, 6:9]
    dvec = rayf[:, 0:3]
    inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
    cnt = cnt_ref[b]
    init_t = tlim_ref[:]
    init_tri = jnp.full((RAY_TILE, 1), -1, jnp.int32)
    live_col = rayf[:, 9:10] > 0.0
    eps_succ = float(np.nextafter(np.float32(baby_eps), np.float32(np.inf)))

    def live_max(best_t):
        return jnp.max(jnp.where(live_col, best_t, 0.0))

    @pl.when(cnt > 0)
    def _():
        ids_dma = pltpu.make_async_copy(ids_hbm.at[b], ids_s, plan_sem.at[0])
        tlo_dma = pltpu.make_async_copy(tlo_hbm.at[b], tlo_s, plan_sem.at[1])
        ids_dma.start()
        tlo_dma.start()
        ids_dma.wait()
        tlo_dma.wait()

        def feat_dma(slot, v):
            sid = ids_s[v // 128, v % 128]
            cols = pl.ds(
                pl.multiple_of(sid * (s * 4 * TRI_TILE), s * 4 * TRI_TILE),
                s * 4 * TRI_TILE,
            )
            return pltpu.make_async_copy(
                feat_hbm.at[:, cols], buf.at[slot], feat_sem.at[slot]
            )

        feat_dma(0, 0).start()

        def cond(carry):
            v, _, _, _, done = carry
            return (v < cnt) & jnp.logical_not(done)

        def body(carry):
            v, best_t, best_tri, mb, _ = carry
            # STRICT >: super tlo is a true lower bound on any member
            # tile's hits, so no better hits and no unresolved exact ties
            # remain past this point (see _planned_kernel).
            stop = tlo_s[v // 128, v % 128] > mb
            slot = jax.lax.rem(v, 2)

            @pl.when(jnp.logical_not(stop) & (v + 1 < cnt))
            def _():
                feat_dma(jax.lax.rem(v + 1, 2), v + 1).start()

            feat_dma(slot, v).wait()

            def run(args):
                best_t, best_tri = args
                sid = ids_s[v // 128, v % 128]
                srow = saabb_ref[pl.ds(sid, 1), :]
                smember, s_tlo, _ = _member_slab(srow, o, inv, tlim_ref[:])
                # ONE improvability gate per super (amortized over the s
                # static tile evaluations -- the round-5 profile showed
                # per-TILE conds cost more than they skip).
                improvable = jnp.any(
                    live_col & smember & (s_tlo <= best_t)
                )

                def super_epilogue(args):
                    best_t, best_tri = args
                    for k in range(s):
                        tile_id = sid * s + k
                        row = aabb_ref[pl.ds(tile_id, 1), :]
                        member, f_tlo, f_thi = _member_slab(
                            row, o, inv, tlim_ref[:]
                        )
                        t_lo = jnp.where(
                            member, jnp.maximum(f_tlo, eps_succ), jnp.inf
                        )
                        t_hi = jnp.where(member, f_thi, -jnp.inf)
                        best_t, best_tri = _walk_quad_epilogue(
                            rayf,
                            buf[slot][
                                :, k * 4 * TRI_TILE : (k + 1) * 4 * TRI_TILE
                            ],
                            baby_eps, lane, tile_id, t_lo, t_hi,
                            best_t, best_tri,
                        )
                    return best_t, best_tri

                return jax.lax.cond(
                    improvable, super_epilogue, lambda a: a,
                    (best_t, best_tri),
                )

            best_t, best_tri = jax.lax.cond(
                stop, lambda a: a, run, (best_t, best_tri)
            )
            return v + 1, best_t, best_tri, live_max(best_t), stop

        _, best_t, best_tri, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), init_t, init_tri, live_max(init_t), False),
        )
        out_t_ref[:] = best_t
        out_tri_ref[:] = best_tri

    @pl.when(cnt <= 0)
    def _():
        out_t_ref[:] = init_t
        out_tri_ref[:] = init_tri


# --- binned (tile-major, ray-packet) traversal ---------------------------
#
# The block-union wall, quantified (PARITY.md "ray-binning"): a 256-ray
# block visits the UNION of its rays' candidate tiles -- 16.3x the per-ray
# candidate floor at 200k tris, and even the unreachable ideal grouping
# sits 9.7x above it.  Binning at PER-RAY granularity reaches the floor
# but its construction (pair sort + per-pair feature gather + scatter-min
# reduce) costs more than it saves (measured round 3).  The compromise
# measured to work: bin 8-ray PACKETS (G = 8).  Packet unions run ~3x the
# per-ray floor (vs 16x for blocks, measured on captured populations), and
# packet granularity divides every construction cost by G: the candidate
# matrix, the rank matmul, the destination scatter, and the gather-back
# reduce all operate on n/8 rows.
#
# Pipeline (all XLA except the pallas kernel):
#   1. per-ray k=2 slab sweep -> packet-reduce: H_g [n_g, Ct], a SUPERSET
#      of every packet member's candidate set (contract: supersets are
#      speed, never correctness).
#   2. rank packets within each tile column (block-triangular matmul) and
#      lay tiles out as GP-padded bins; scatter each packet's id to its
#      (tile, rank) slot.
#   3. gather packet records ([G*NUM_F] per packet) into bin order; the
#      kernel sees 256-row visits (GP = 32 packets) that are
#      tile-HOMOGENEOUS: one DMA'd feature tile per visit, every row's own
#      k=1 member test, the shared quad epilogue, NO cross-visit state.
#   4. reduce per ray across its packet's visits: scatter-min by packet id
#      (t, then lowest-tri among ties) -- the contract's winner rule.
#
# No front-to-back early exit exists in this mode (a ray's candidates are
# evaluated unconditionally); the pair population is the per-packet
# candidate sum, which IS the quantity the other kernels cannot reach.
BINNED_G = int(os.environ.get("PTT_BINNED_G", "8"))  # rays per packet
BINNED_PAIR_MEAN = int(os.environ.get("PTT_BINNED_PAIR_MEAN", "14"))
# Live-prefix tiers the binned path covers, as divisors of n (descending
# selectivity): the smallest prefix holding every live ray wins, so late
# sparse bounces pay a small construction bill and mid bounces a larger
# one; live counts beyond the largest tier fall back to the streamed walk.
# The PAIR BUDGET is tier-independent (sized at the n/4 prefix), so a
# deeper tier only shrinks construction, never trips a tighter budget.
# Measured on the 200k mesh (800^2, v5e): live_pos <= 77k on EVERY bounce,
# so the 1/8 tier engages throughout and halves every construction cost
# vs the old (4,)-only default.
BINNED_PREFIX_TIERS = tuple(
    int(s)
    for s in os.environ.get("PTT_BINNED_TIERS", "8,4").split(",")
    if s.strip()
)
# Bin-construction layout: 0 scatters the dense [n_g, Ct] slot matrix
# (input-linear in tiles); K > 0 compacts each packet's candidate row to
# its K lowest slot ids via one lax.top_k (the scatter input shrinks to
# [n_g, K] AND the per-packet slot list `dst` comes out for free, which
# turns the per-ray reduce from two serial scatter-mins into one dense
# row gather + min).  K is clamped to Ct; packets with more than K
# candidates overflow to the streamed fallback.  Measured packet
# candidate max on the 200k mesh is ~104 across all bounces, so the
# default 128 never overflows there while p99 sits at ~77.
BINNED_TOPK = int(os.environ.get("PTT_BINNED_TOPK", "128"))
_INT_BIG = np.int32(2**31 - 1)


def _binned_kernel(
    baby_eps: float,
    nv: int,
    # scalar prefetch (SMEM)
    vt_ref,  # [NV] i32 tile id per visit (-1 = empty slot region)
    # tensor refs
    pairf_ref,  # [256, NUM_F] VMEM: packet-record rows in bin order
    ptlim_ref,  # [256, 1] VMEM
    aabb_ref,  # [Ct, 8] VMEM tile bounds
    feat_hbm,  # [NUM_F, 4*Tp] HBM (ANY)
    out_t_ref,  # [256, 1]
    out_tri_ref,  # [256, 1] i32
    # scratch (persists across grid steps: double-buffered feature tiles)
    buf,  # VMEM (2, NUM_F, 4*TRI_TILE)
    feat_sem,  # DMA (2,)
):
    """One tile-homogeneous visit: 256 pair rows against ONE feature tile.

    Stateless across visits (the reduce happens in XLA), so the grid is
    embarrassingly parallel; consecutive visits double-buffer their
    feature-tile DMAs through persistent scratch."""
    v = pl.program_id(0)
    tile = vt_ref[v]

    def feat_dma(slot, t_id):
        cols = pl.ds(
            pl.multiple_of(t_id * (4 * TRI_TILE), 4 * TRI_TILE),
            4 * TRI_TILE,
        )
        return pltpu.make_async_copy(
            feat_hbm.at[:, cols], buf.at[slot], feat_sem.at[slot]
        )

    # Double buffer across grid steps: visit v's DMA was started by visit
    # v-1 (v=0 starts its own); start v+1's transfer before waiting.
    @pl.when((v == 0) & (tile >= 0))
    def _():
        feat_dma(0, tile).start()

    @pl.when(v + 1 < nv)
    def _():
        nxt = vt_ref[v + 1]

        @pl.when(nxt >= 0)
        def _():
            feat_dma((v + 1) % 2, nxt).start()

    @pl.when(tile >= 0)
    def _():
        slot = jax.lax.rem(v, 2)
        feat_dma(slot, tile).wait()
        pairf = pairf_ref[:]
        o = pairf[:, 6:9]
        d = pairf[:, 0:3]
        inv = 1.0 / jnp.where(d == 0.0, 1e-20, d)
        tlim = ptlim_ref[:]
        row = aabb_ref[pl.ds(tile, 1), :]
        member, s_tlo, s_thi = _member_slab(row, o, inv, tlim)
        eps_succ = float(
            np.nextafter(np.float32(baby_eps), np.float32(np.inf))
        )
        t_lo = jnp.where(member, jnp.maximum(s_tlo, eps_succ), jnp.inf)
        t_hi = jnp.where(member, s_thi, -jnp.inf)
        quad = jnp.dot(pairf, buf[slot], preferred_element_type=jnp.float32)
        # Heavy path: round-4 expression graph (see _mt_hit_legacy).
        hit, tt = _mt_hit_legacy(quad, t_lo, t_hi, baby_eps)
        ttm = jnp.where(hit, tt, jnp.inf)
        row_min = jnp.min(ttm, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TRI_TILE), 1)
        lane_masked = jnp.where(ttm <= row_min, lane, TRI_TILE)
        kbest = jnp.min(lane_masked, axis=1, keepdims=True)
        # STRICT <: a mesh hit exactly at t_limit loses to the prim hit in
        # every kernel (their update rule ties resolve toward tri = -1).
        acc = row_min < tlim
        out_t_ref[:] = jnp.where(acc, row_min, jnp.inf)
        out_tri_ref[:] = jnp.where(acc, tile * TRI_TILE + kbest, -1)

    @pl.when(tile < 0)
    def _():
        out_t_ref[:] = jnp.full((RAY_TILE, 1), jnp.inf, jnp.float32)
        out_tri_ref[:] = jnp.full((RAY_TILE, 1), -1, jnp.int32)


def _packet_bins(aabb_c, rayf_p, tlim_p, pair_budget, topk):
    """Packet (G-ray) candidate bins: which packets visit which tiles,
    laid out tile-major in GP-padded slot runs.

    Returns ``(src [B] i32 packet-id per slot (n_g = dead), vt [NV] i32
    tile per visit, dst [n_g, K] i32 per-packet slot list (_INT_BIG =
    unused entry; None when topk == 0), overflow bool)``.  The k=2 slab
    keeps the bins a superset of the kernel's k=1 member test (module
    contract)."""
    npre = rayf_p.shape[0]
    g = BINNED_G
    gp = RAY_TILE // g
    n_g = npre // g
    ct = aabb_c.shape[0]
    o = rayf_p[:, 6:9]
    d = rayf_p[:, 0:3]
    live = rayf_p[:, 9] > 0.0
    tl = tlim_p[:, 0]
    invx = 1.0 / jnp.where(d[:, 0] == 0.0, 1e-20, d[:, 0])
    invy = 1.0 / jnp.where(d[:, 1] == 0.0, 1e-20, d[:, 1])
    invz = 1.0 / jnp.where(d[:, 2] == 0.0, 1e-20, d[:, 2])
    hs = []
    TC = 16
    for c0 in range(0, ct, TC):
        rows = aabb_c[c0 : c0 + TC]
        lo, hi = rows[:, 0:3], rows[:, 3:6]
        t1x = (lo[None, :, 0] - o[:, None, 0]) * invx[:, None]
        t2x = (hi[None, :, 0] - o[:, None, 0]) * invx[:, None]
        t1y = (lo[None, :, 1] - o[:, None, 1]) * invy[:, None]
        t2y = (hi[None, :, 1] - o[:, None, 1]) * invy[:, None]
        t1z = (lo[None, :, 2] - o[:, None, 2]) * invz[:, None]
        t2z = (hi[None, :, 2] - o[:, None, 2]) * invz[:, None]
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        tlo, thi = _widen_slab(tlo, thi, k=2)
        h = (thi >= tlo) & (thi > 0.0) & (tlo < tl[:, None]) & live[:, None]
        hs.append(h.reshape(n_g, g, rows.shape[0]).any(axis=1))
    hg = jnp.concatenate(hs, axis=1)  # [n_g, Ct] packet candidates

    # rank of packet i within tile column c = # candidate packets above it
    # (block-triangular matmul: MXU does the column cumsum).
    n_g_pad = ((n_g + 255) // 256) * 256
    hf = jnp.pad(hg.astype(jnp.float32), ((0, n_g_pad - n_g), (0, 0)))
    tri = jnp.asarray(
        np.tril(np.ones((256, 256), np.float32), -1)
    )
    hb = hf.reshape(-1, 256, ct)
    within = jnp.einsum(
        "rs,bsc->brc", tri, hb, preferred_element_type=jnp.float32
    )
    blk = hb.sum(axis=1)
    off_blk = jnp.cumsum(blk, axis=0) - blk
    rank = (within + off_blk[:, None, :]).reshape(n_g_pad, ct)[:n_g]
    rank = rank.astype(jnp.int32)

    n_c = hg.sum(axis=0).astype(jnp.int32)  # [Ct]
    pad_cnt = ((n_c + gp - 1) // gp) * gp
    cum_end = jnp.cumsum(pad_cnt)
    off = cum_end - pad_cnt
    total = cum_end[-1]
    overflow = total > pair_budget

    if topk > 0:
        # Slot-top_k compaction: each packet's candidate slots (off[c] +
        # rank, ascending in c because off and rank are) are the K
        # smallest entries of a [n_g, ct] slot matrix whose non-candidates
        # are _INT_BIG.  One lax.top_k call replaces the dense scatter
        # input (n_g*ct -> n_g*K) AND yields the per-packet slot list
        # `dst` that the gather-based reduce in _run_binned consumes.  A
        # packet with more than K candidates sets overflow -> streamed
        # fallback, so the bins stay exact candidate supersets.
        K = min(topk, ct)
        slotmat = jnp.where(hg, off[None, :] + rank, _INT_BIG)
        if K < ct:
            cnt_row = jnp.sum(hg, axis=1)
            overflow = overflow | jnp.any(cnt_row > K)
            neg_vals, _ = jax.lax.top_k(-slotmat, K)
            dst = -neg_vals  # [n_g, K], ascending; _INT_BIG = unused
        else:
            # K == ct: the slot matrix IS the per-packet slot list -- row
            # order is irrelevant to both the src scatter and the
            # gather-based reduce, so the top_k sort is pure waste here,
            # and no per-packet overflow is possible.
            dst = slotmat
        src_ids = jnp.broadcast_to(
            jax.lax.iota(jnp.int32, n_g)[:, None], (n_g, K)
        )
    else:
        dst = jnp.where(hg, off[None, :] + rank, pair_budget)  # OOB -> drop
        src_ids = jnp.broadcast_to(
            jax.lax.iota(jnp.int32, n_g)[:, None], (n_g, ct)
        )
    src = (
        jnp.full((pair_budget,), n_g, jnp.int32)
        .at[dst.reshape(-1)]
        .set(src_ids.reshape(-1), mode="drop")
    )
    nv = pair_budget // gp
    slots = jax.lax.iota(jnp.int32, nv) * gp
    vt = jnp.searchsorted(cum_end, slots, side="right").astype(jnp.int32)
    vt = jnp.where(slots < total, jnp.minimum(vt, ct - 1), -1)
    return src, vt, (dst if topk > 0 else None), overflow


def _run_binned(
    rayf_p, feat, aabb_c, tlim_p, baby_eps, interpret, topk,
    budget_rays=None,
):
    """Packet-binned traversal over the (sorted live) prefix; bit-identical
    to the sweep by the candidate contract.  Returns (t, tri) [npre, 1].

    ``budget_rays`` sizes the pair budget independently of the engaged
    tier (callers pass max(npre, n/4)): the live pairs are a property of
    the POPULATION, not of the prefix that happens to hold it, so a
    deeper tier must not tighten the budget and trip spurious overflow
    fallbacks."""
    npre = rayf_p.shape[0]
    g = BINNED_G
    gp = RAY_TILE // g
    n_g = npre // g
    ct = aabb_c.shape[0]
    n_g_budget = (budget_rays if budget_rays is not None else npre) // g
    pair_budget = n_g_budget * min(BINNED_PAIR_MEAN, ct) + gp * ct
    pair_budget = ((pair_budget + gp - 1) // gp) * gp
    src, vt, dst, overflow = _packet_bins(
        aabb_c, rayf_p, tlim_p, pair_budget, topk
    )

    # Packet records in bin order: one [G*NUM_F]-wide row gather per slot
    # (+1 zero row for dead slots).
    recs = jnp.concatenate(
        [rayf_p.reshape(n_g, g * NUM_F), jnp.zeros((1, g * NUM_F))], axis=0
    )
    pairf = recs[src].reshape(pair_budget * g, NUM_F)
    tlg = jnp.concatenate(
        [tlim_p.reshape(n_g, g), jnp.zeros((1, g))], axis=0
    )
    ptlim = tlg[src].reshape(pair_budget * g, 1)

    nv = pair_budget // gp
    kern = functools.partial(_binned_kernel, baby_eps, nv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, NUM_F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(aabb_c.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # features (HBM)
        ],
        out_specs=(
            pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_F, 4 * TRI_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    pair_t, pair_tri = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((pair_budget * g, 1), jnp.float32),
            jax.ShapeDtypeStruct((pair_budget * g, 1), jnp.int32),
        ),
        interpret=interpret,
    )(vt, pairf, ptlim, aabb_c, feat)

    # Reduce per ray across its packet's visits: min t, then lowest tri
    # among exact-t ties (the contract's winner rule).
    pt = pair_t.reshape(pair_budget, g)
    ptri = pair_tri.reshape(pair_budget, g)
    if dst is not None:
        # Gather-based reduce: each packet reads its OWN <= K visit rows
        # (dst from _packet_bins) and mins across them in dense XLA --
        # two serial scatter-mins become one row gather + elementwise
        # min.  Unused dst entries (_INT_BIG) clamp to the pad row
        # (inf / _INT_BIG), which is the reduce's identity.
        dsts = jnp.minimum(dst, pair_budget)
        rows_t = jnp.concatenate(
            [pt, jnp.full((1, g), jnp.inf)], axis=0
        )[dsts]  # [n_g, K, g]
        tmin = jnp.min(rows_t, axis=1)
        rows_tri = jnp.concatenate(
            [ptri, jnp.full((1, g), _INT_BIG, jnp.int32)], axis=0
        )[dsts]
        cand_tri = jnp.where(rows_t == tmin[:, None, :], rows_tri, _INT_BIG)
        trimin = jnp.min(cand_tri, axis=1)
    else:
        tmin = (
            jnp.full((n_g + 1, g), jnp.inf)
            .at[src]
            .min(pt, mode="drop")
        )
        pair_tmin = tmin[src]
        cand_tri = jnp.where(pt == pair_tmin, ptri, _INT_BIG)
        trimin = (
            jnp.full((n_g + 1, g), _INT_BIG, jnp.int32)
            .at[src]
            .min(cand_tri, mode="drop")
        )[:n_g]
        tmin = tmin[:n_g]
    hit = tmin < jnp.inf
    out_t = jnp.where(hit, tmin, tlim_p.reshape(n_g, g))
    out_tri = jnp.where(hit, trimin, -1)
    return (
        out_t.reshape(npre, 1),
        out_tri.reshape(npre, 1),
        overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_tris", "padded_tris", "baby_eps", "sort_rays", "sort_bits",
        "sort_dir_bits", "mesh_bounds", "chunk_tris", "interpret", "planned",
        "sort_mode", "streamed", "binned", "binned_tiers", "binned_topk",
        "binned_budget_rays", "plan_frustum", "plan_impl",
        "planned_epilogue", "mono",
    ),
)
def _run(
    features,
    tile_aabb,
    group_aabb,
    center,
    ox, oy, oz, dx, dy, dz, active, t_limit,
    num_tris: int,
    padded_tris: int,
    baby_eps: float,
    sort_rays: bool = False,
    sort_bits: int = 3,
    sort_dir_bits: int = 3,
    mesh_bounds: tuple = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0),
    chunk_tris: int = CHUNK_TRIS,
    interpret: bool = False,
    planned: bool = False,
    sort_mode: str = "morton",
    streamed: bool = False,
    binned: bool = False,
    binned_tiers: tuple = None,
    binned_topk: int = None,
    binned_budget_rays: int = None,
    plan_frustum: bool = False,
    plan_impl: str = "xla",
    planned_epilogue: str = "lanebest",
    mono: bool = False,
    sort_key: "jnp.ndarray | None" = None,  # precomputed coherence key [n]
):
    n = ox.shape[0]
    n_pad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    pad = lambda x, fill=0.0: jnp.pad(x, (0, n_pad - n), constant_values=fill)

    # --- per-ray ROOT cull (the BVH root test, vectorized) ----------------
    # A ray whose slab test provably misses the whole mesh AABB closer than
    # its t_limit cannot produce a hit: zero its features exactly like a
    # dead ray's.  Its kernel output (t = t_limit, tri = -1) is already the
    # correct miss result, and -- crucially -- with sorting on, such rays
    # share the dead-ray sentinel key, pack into all-dead trailing blocks,
    # and skip the triangle loop entirely.  In object-in-a-box scenes most
    # rays miss the root (measured 78-90% per bounce on cornell_mesh_5k),
    # so this removes whole rays from the MXU sweep the way the reference's
    # BVH root node rejects them in one visit.
    root = root_hit_mask(tile_aabb, center, ox, oy, oz, dx, dy, dz, t_limit)
    active = active & root

    osx = pad(ox) - center[0]
    osy = pad(oy) - center[1]
    osz = pad(oz) - center[2]
    dxp, dyp, dzp = pad(dx), pad(dy), pad(dz)

    cxdx = osy * dzp - osz * dyp
    cxdy = osz * dxp - osx * dzp
    cxdz = osx * dyp - osy * dxp
    one = jnp.where(pad(active.astype(jnp.float32)) > 0, 1.0, 0.0)
    zero = jnp.zeros_like(one)
    # Inactive rays: zero features -> det = 0 -> no hits.
    rayf = jnp.stack(
        [
            dxp * one, dyp * one, dzp * one,
            cxdx * one, cxdy * one, cxdz * one,
            osx * one, osy * one, osz * one,
            one,
            zero, zero, zero, zero, zero, zero,
        ],
        axis=1,
    )  # [n_pad, NUM_F]

    tlim = pad(t_limit, 3.4e38)[:, None]

    if sort_rays:
        # Per-bounce ray-coherence sort (see _coherence_keys).  Pure
        # permutation: the per-ray result is independent of block grouping
        # (tile visit order and in-tile tie-breaks are ray-local), so the
        # unsorted scatter-back below is bit-identical to sort off.
        if sort_key is not None:
            # Precomputed key (the fused shade kernel's in-kernel emission,
            # == the XLA signature key exactly): the pixel-order bounce
            # hands it in so the whole key build is skipped.  Padding rays
            # are dead (features zeroed) -- the dead sentinel keeps them
            # packed at the back like every other dead ray.
            key = jnp.pad(
                sort_key, (0, n_pad - n), constant_values=(1 << 30) + 2
            )
        elif sort_mode == "signature":
            key = _signature_keys(
                tile_aabb, osx, osy, osz, dxp, dyp, dzp, one, tlim[:, 0]
            )
        else:
            lo = jnp.asarray(mesh_bounds[:3], jnp.float32) - center
            hi = jnp.asarray(mesh_bounds[3:], jnp.float32) - center
            key = _coherence_keys(
                osx, osy, osz, dxp, dyp, dzp, one, lo, hi, sort_bits,
                sort_dir_bits,
            )
        perm = jnp.argsort(key)
        rayf = rayf[perm]
        tlim = tlim[perm]
        # The chunked chain's envelope cull below reads osx..dzp directly;
        # they MUST live in the same (sorted) order as rayf/tlim/out_t, or
        # the cull zeroes the wrong rays' features and drops genuine hits.
        osx, osy, osz = osx[perm], osy[perm], osz[perm]
        dxp, dyp, dzp = dxp[perm], dyp[perm], dzp[perm]

    num_ray_tiles = n_pad // RAY_TILE
    grid = (num_ray_tiles,)

    def run_chunk_planned(rayf_c, feat_c, aabb_c, tlim_c):
        """Ordered block-sparse traversal: an XLA prepass builds per-block
        front-to-back candidate tile lists (scalar-prefetched), and the
        kernel walks them with an early exit -- the BVH's ordered descent
        at (256-ray block x TRI_TILE tile) granularity."""
        ct = aabb_c.shape[0]
        ids, tlo_s, cnt = _plan_with_prefix(
            aabb_c, rayf_c, tlim_c, frustum=plan_frustum, impl=plan_impl,
            interpret=interpret,
        )
        # Lane-best epilogue for small tile counts (see the kernel's
        # docstring; identical results -- the [R, T] accumulators cap the
        # tile count).  Compiled mode only: under interpret the kernel
        # inlines into the whole-program XLA module and its (value-
        # identical) graph shape perturbs the compiler's contraction
        # choices in SHARED stages elsewhere in the program -- observed as
        # 1-ulp image drift between otherwise bit-identical toggle
        # configs, while every per-stage output compared equal.  On TPU
        # the pallas_call is an opaque custom call, so no such leak
        # exists.  "lanebest_force" selects it under interpret too (unit
        # tests exercise the kernel logic per-module, where it is exact).
        lanebest = ct <= 24 and (
            planned_epilogue == "lanebest_force"
            or (planned_epilogue == "lanebest" and not interpret)
        )
        kern = functools.partial(
            _planned_kernel_lanebest if lanebest else _planned_kernel,
            baby_eps, ct,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RAY_TILE, NUM_F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(feat_c.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(aabb_c.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            ),
            interpret=interpret,
        )(ids, tlo_s, cnt, rayf_c, tlim_c, feat_c, aabb_c)

    def run_streamed(rayf_c, feat_c, aabb_c, tlim_c):
        """One pallas_call for any mesh size: plan rows live in HBM (DMA'd
        per block into SMEM), candidate feature tiles stream HBM->VMEM
        double-buffered, early exit is global front-to-back."""
        ctf = aabb_c.shape[0]
        nb = n_pad // RAY_TILE
        ids, tlo_s, cnt = _plan_with_prefix(
            aabb_c, rayf_c, tlim_c, frustum=plan_frustum, impl=plan_impl,
            interpret=interpret,
        )
        # Fixed [NB, 8, 128] plan layout: the per-block DMA slice is then a
        # whole (8, 128) tile -- any other shape trips Mosaic's sublane/lane
        # alignment rules.  Capacity 1024 tiles = 1M triangles (guarded in
        # the caller); the walk only reads t < cnt <= ct.
        cap = 8 * 128
        ids2 = jnp.pad(ids.reshape(nb, ctf), ((0, 0), (0, cap - ctf)))
        ids2 = ids2.reshape(nb, 8, 128)
        tlo2 = jnp.pad(
            tlo_s.reshape(nb, ctf), ((0, 0), (0, cap - ctf)),
            constant_values=jnp.inf,
        ).reshape(nb, 8, 128)
        kern = functools.partial(_streamed_kernel, baby_eps, ctf)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RAY_TILE, NUM_F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(aabb_c.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # features (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # plan ids (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # plan tlo (HBM)
            ],
            out_specs=(
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, NUM_F, 4 * TRI_TILE), jnp.float32),
                pltpu.SMEM((8, 128), jnp.int32),
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            ),
            interpret=interpret,
        )(cnt, rayf_c, tlim_c, aabb_c, feat_c, ids2, tlo2)

    def run_streamed_super(rayf_c, feat_c, aabb_c, tlim_c):
        """Super-tile streamed walk (see _streamed_super_kernel): plan,
        DMA, and early exit at SUPER_TILES-tile granularity; per-tile
        member windows + shared epilogue keep the contract exact."""
        s = SUPER_TILES
        ctf = aabb_c.shape[0]
        cs = (ctf + s - 1) // s
        if ctf % s:
            # tests / odd tables: pad fine rows with never-hit boxes and
            # feature columns with zeros (production big-mesh tables are
            # already super-padded at build)
            padr = cs * s - ctf
            never = jnp.concatenate(
                [jnp.full((padr, 3), 1e30), jnp.full((padr, 5), -1e30)],
                axis=1,
            ).astype(jnp.float32)
            aabb_c = jnp.concatenate([aabb_c, never], axis=0)
            feat_c = jnp.pad(
                feat_c, ((0, 0), (0, padr * 4 * TRI_TILE))
            )
        grp = aabb_c.reshape(cs, s, 8)
        saabb = jnp.concatenate(
            [
                jnp.min(grp[:, :, 0:3], axis=1),
                jnp.max(grp[:, :, 3:6], axis=1),
                jnp.zeros((cs, 2), jnp.float32),
            ],
            axis=1,
        )
        nb = n_pad // RAY_TILE
        ids, tlo_s, cnt = _plan_with_prefix(
            saabb, rayf_c, tlim_c, frustum=plan_frustum, impl=plan_impl,
            interpret=interpret,
        )
        cap = 8 * 128
        ids2 = jnp.pad(ids.reshape(nb, cs), ((0, 0), (0, cap - cs)))
        ids2 = ids2.reshape(nb, 8, 128)
        tlo2 = jnp.pad(
            tlo_s.reshape(nb, cs), ((0, 0), (0, cap - cs)),
            constant_values=jnp.inf,
        ).reshape(nb, 8, 128)
        kern = functools.partial(
            _streamed_super_kernel, baby_eps, cs, cs * s
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RAY_TILE, NUM_F), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cs * s, 8), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cs, 8), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # features (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # plan ids (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # plan tlo (HBM)
            ],
            out_specs=(
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, NUM_F, SUPER_TILES * 4 * TRI_TILE), jnp.float32),
                pltpu.SMEM((8, 128), jnp.int32),
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            ),
            interpret=interpret,
        )(cnt, rayf_c, tlim_c, aabb_c, saabb, feat_c, ids2, tlo2)

    def run_mono(rayf_c, feat_c, aabb_c, tlim_c):
        """Plan-free static-unroll traversal (see _mono_kernel): no scalar
        prefetch, no plan prepass -- the whole XLA plan stage disappears
        from the bounce."""
        ct_m = aabb_c.shape[0]
        kern = functools.partial(_mono_kernel, baby_eps, ct_m)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RAY_TILE, NUM_F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(feat_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(aabb_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            ),
            interpret=interpret,
        )(rayf_c, tlim_c, feat_c, aabb_c)

    def run_chunk(rayf_c, feat_c, aabb_c, gaabb_c, tlim_c):
        """One pallas_call over a VMEM-resident feature chunk."""
        num_groups = feat_c.shape[1] // (4 * GROUP_TRIS)
        kern = functools.partial(_intersect_kernel, baby_eps, num_groups)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((RAY_TILE, NUM_F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                # full chunk tables resident in VMEM for the whole kernel
                pl.BlockSpec(feat_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(aabb_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(gaabb_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            ),
            interpret=interpret,
        )(rayf_c, tlim_c, feat_c, aabb_c, gaabb_c)

    # Capacity fallbacks FIRST (they may re-enable planned), THEN the SMEM
    # budget guard: the streamed plan holds at most 1024 tiles (~1M tris);
    # beyond it the chunked planned chain takes over -- but that chain's
    # per-chunk [NB*Ct] id+tlo scalar-prefetch operands must still respect
    # the ~1 MB SMEM budget (observed overflow at RAY_TILE=128 on the 80k
    # mesh), so the budget check runs AFTER any fallback rewrites planned.
    if streamed and padded_tris // TRI_TILE > 8 * 128:
        streamed, planned = False, True
    if binned and padded_tris // TRI_TILE > 8 * 128:
        binned = False  # needs the streamed fallback's plan capacity
    # Mono: capacity fallback to planned beyond its band, and (like the
    # lane-best epilogue) compiled-mode only by default -- under interpret
    # the inlined kernel graph perturbs shared-stage fusion elsewhere in
    # the program (1-ulp toggle drift); planned_epilogue="mono_force" opts
    # in for unit tests, which compare kernel outputs directly.
    use_mono = (
        mono
        and padded_tris // TRI_TILE <= MONO_MAX_TILES
        and padded_tris <= chunk_tris
        and (not interpret or planned_epilogue == "mono_force")
    )
    nb_blocks = n_pad // RAY_TILE
    ct_per_call = min(padded_tris, chunk_tris) // TRI_TILE
    if planned and not streamed and (
        nb_blocks * max(1, ct_per_call) * 8 > 700_000
    ):
        planned = False

    if binned:
        # Packet-binned traversal over the sorted live prefix; the
        # smallest configured tier holding every live ray engages, live
        # counts beyond the largest tier or a bin-budget overflow fall
        # back to the streamed walk (bit-identical either way --
        # candidate contract).
        live_pos = jnp.max(
            jnp.where(
                rayf[:, 9] > 0.0, jax.lax.iota(jnp.int32, n_pad), -1
            )
        )

        topk = binned_topk if binned_topk is not None else BINNED_TOPK

        def binned_at(npre):
            def branch(_):
                t_p, tri_p, ovf = _run_binned(
                    rayf[:npre], features, tile_aabb, tlim[:npre],
                    baby_eps, interpret, topk,
                    budget_rays=max(
                        npre,
                        (binned_budget_rays or n_pad) // 4,
                    ),
                )
                full_t = jnp.concatenate([t_p, tlim[npre:]], axis=0)
                full_tri = jnp.concatenate(
                    [tri_p, jnp.full((n_pad - npre, 1), -1, jnp.int32)],
                    axis=0,
                )
                return jax.lax.cond(
                    ovf,
                    lambda __: run_streamed(
                        rayf, features, tile_aabb, tlim
                    ),
                    lambda __: (full_t, full_tri),
                    None,
                )

            return branch

        npres = []
        tiers = (
            binned_tiers if binned_tiers is not None else BINNED_PREFIX_TIERS
        )
        for div in sorted(set(tiers), reverse=True):
            npre = min(
                n_pad,
                ((n_pad // div + RAY_TILE - 1) // RAY_TILE) * RAY_TILE,
            )
            # div > n_pad rounds to an empty prefix -- skip the degenerate
            # 0-row branch (same guard as fused.tier_sizes).
            if 0 < npre and npre not in npres:
                npres.append(npre)

        chain = lambda _: run_streamed(rayf, features, tile_aabb, tlim)
        for npre in reversed(npres):
            chain = (
                lambda _, npre=npre, nxt=chain: jax.lax.cond(
                    live_pos < npre, binned_at(npre), nxt, None
                )
            )
        out_t, out_tri = chain(None)
    elif use_mono:
        out_t, out_tri = run_mono(rayf, features, tile_aabb, tlim)
    elif streamed and stream_super_enabled(padded_tris):
        out_t, out_tri = run_streamed_super(rayf, features, tile_aabb, tlim)
    elif streamed:
        out_t, out_tri = run_streamed(rayf, features, tile_aabb, tlim)
    elif padded_tris <= chunk_tris:
        if planned:
            out_t, out_tri = run_chunk_planned(rayf, features, tile_aabb, tlim)
        else:
            out_t, out_tri = run_chunk(
                rayf, features, tile_aabb, group_aabb, tlim
            )
    else:
        # Chunked multi-call chain for >chunk_tris meshes: each chunk's
        # closest hit feeds the next chunk's t_limit so later chunks prune
        # against everything already found; merge keeps the global best.
        out_t, out_tri = tlim, None
        groups_per_chunk = max(1, chunk_tris // GROUP_TRIS)
        chunk_sz = groups_per_chunk * GROUP_TRIS
        num_chunks = (padded_tris + chunk_sz - 1) // chunk_sz
        invx = 1.0 / jnp.where(dxp == 0.0, 1e-20, dxp)
        invy = 1.0 / jnp.where(dyp == 0.0, 1e-20, dyp)
        invz = 1.0 / jnp.where(dzp == 0.0, 1e-20, dzp)
        for ci in range(num_chunks):
            g0 = ci * groups_per_chunk
            g1 = min(padded_tris // GROUP_TRIS, g0 + groups_per_chunk)
            feat_c = features[:, g0 * 4 * GROUP_TRIS : g1 * 4 * GROUP_TRIS]
            aabb_c = tile_aabb[g0 * GROUP_TILES : g1 * GROUP_TILES]
            gaabb_c = group_aabb[g0:g1]
            # Per-ray CHUNK-envelope cull against the RUNNING best t: the
            # chunk's tiles are BVH-leaf-ordered (spatially tight), so with
            # coherence sorting most 256-ray blocks overlap 1-2 chunks and
            # the rest go fully dead -> block_live skips their tri loop.
            # Conservative (slab bounds are monotone in the box), so the
            # result is bit-identical to the unculled chain.
            clo = jnp.min(aabb_c[:, 0:3], axis=0)
            chi = jnp.max(aabb_c[:, 3:6], axis=0)
            t1x, t2x = (clo[0] - osx) * invx, (chi[0] - osx) * invx
            t1y, t2y = (clo[1] - osy) * invy, (chi[1] - osy) * invy
            t1z, t2z = (clo[2] - osz) * invz, (chi[2] - osz) * invz
            ctlo = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            cthi = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            ctlo, cthi = _widen_slab(ctlo, cthi, k=2)
            if planned:
                # The plan prepass embodies the chunk cull (per-block tile
                # candidates against the running best t).
                t_c, tri_c = run_chunk_planned(rayf, feat_c, aabb_c, out_t)
            else:
                ok = (cthi >= ctlo) & (cthi > 0.0) & (ctlo < out_t[:, 0])
                rayf_c = rayf * ok.astype(jnp.float32)[:, None]
                t_c, tri_c = run_chunk(rayf_c, feat_c, aabb_c, gaabb_c, out_t)
            better = tri_c >= 0  # kernel only reports hits closer than tlim
            tri_glob = jnp.where(better, tri_c + g0 * GROUP_TRIS, -1)
            if out_tri is None:
                out_t, out_tri = t_c, tri_glob
            else:
                out_t = jnp.where(better, t_c, out_t)
                out_tri = jnp.where(better, tri_glob, out_tri)

    if sort_rays:
        # Scatter results back to original ray order: res[perm[i]] = out[i].
        unsort = lambda o: jnp.zeros_like(o).at[perm].set(o)
        out_t, out_tri = unsort(out_t), unsort(out_tri)

    tri = out_tri[:n, 0]
    tri = jnp.where(tri >= num_tris, -1, tri)  # padded fake tris never hit, but be safe
    return out_t[:n, 0], tri


# Auto-traversal binned band (padded triangle counts): the packet-binned
# traversal wins ONLY here on v5e -- 659 vs 917 ms at 200k, but 470 vs
# 444 at 80k and 2757 vs 1673 at 500k (PARITY.md round-3 campaign): bin
# construction is XLA sort/gather bound and grows with tile count, while
# below ~128k the streamed walk's unions are already cheap.  Bounds sit
# at the measured win's neighbors with margin; results are bit-identical
# either way (candidate contract), so the band only affects speed.
BINNED_AUTO_MIN = int(os.environ.get("PTT_BINNED_AUTO_MIN", str(128 * 1024)))
BINNED_AUTO_MAX = int(os.environ.get("PTT_BINNED_AUTO_MAX", str(320 * 1024)))


def resolve_plan_frustum(mxu_plan: str, sorted_state: bool) -> bool:
    """Resolve ``RenderConfig.mxu_plan``.  "auto" = EXACT everywhere: the
    frustum plan measured a NET LOSS at frame level on v5e despite its
    ~free prepass -- 5k 146.3 vs 143.6 ms, 80k 504 vs 420 (r4 campaign) --
    because envelope-hull candidate sets admit extra tile visits AND their
    looser tlo lower bounds fire the ordered walks' early exit later,
    which costs far more than the O(N*Ct) prepass it saves.  Kept as an
    explicit option (and a bit-identity test) for future hardware where
    the trade flips."""
    if mxu_plan == "frustum":
        return True
    if mxu_plan in ("exact", "auto"):
        return False
    raise ValueError(f"unknown mxu_plan mode: {mxu_plan!r}")


def resolve_traversal_mode(mode: str, padded_tris: int) -> str:
    """Resolve "auto" to a concrete traversal for this mesh size: MONO
    (plan-free static unroll, see _mono_kernel) within its measured band
    (<= MONO_MAX_TILES tiles), planned for other VMEM-resident meshes
    (<= CHUNK_TRIS; the feature table lives in VMEM so streaming buys
    nothing), packet-binned in its measured winning band (see
    BINNED_AUTO_MIN/MAX), streamed for everything else beyond CHUNK_TRIS
    (measured faster than the chunked planned chain -- 67 vs 72 ms at
    80k, 154 vs 163 ms at 200k on v5e -- because ONE call walks a GLOBAL
    front-to-back plan instead of per-chunk plans in fixed leaf order)."""
    if mode != "auto":
        return mode
    if padded_tris <= MONO_MAX_TILES * TRI_TILE:
        return "mono"
    if padded_tris <= CHUNK_TRIS:
        return "planned"
    if BINNED_AUTO_MIN < padded_tris <= BINNED_AUTO_MAX:
        return "binned"
    return "streamed"


def traversal_flags(
    mode: str, padded_tris: int, binned_tiers: tuple = None,
    binned_budget_rays: int = None,
) -> dict:
    """Resolve ``RenderConfig.mxu_traversal`` to kernel flags (see
    ``resolve_traversal_mode`` for the "auto" policy).  Explicit
    "streamed" keeps planned=True as its >1024-tile capacity fallback."""
    mode = resolve_traversal_mode(mode, padded_tris)
    if mode == "sweep":
        return dict(planned=False, streamed=False)
    if mode == "mono":
        # planned=True backs the interpret / capacity fallback
        return dict(planned=True, streamed=False, mono=True)
    if mode == "planned":
        return dict(planned=True, streamed=False)
    if mode == "streamed":
        return dict(planned=True, streamed=True)
    if mode == "binned":
        # packet-binned with the streamed walk as its liveness/overflow
        # fallback (planned=True backs the >1024-tile capacity path)
        flags = dict(planned=True, streamed=True, binned=True)
        if binned_tiers is not None:
            flags["binned_tiers"] = tuple(binned_tiers)
        if binned_budget_rays is not None:
            # Anchor the pair budget to the UNSLICED ray count: when a
            # bounce-tier prefix hands the intersector a slice, the live
            # pair population is unchanged, so a slice-local budget would
            # trip spurious overflow fallbacks (the round-3 tiers+binned
            # regression, PARITY.md).
            flags["binned_budget_rays"] = int(binned_budget_rays)
        return flags
    raise ValueError(f"unknown mxu_traversal mode: {mode!r}")


def mesh_intersect_mxu(
    tables: MXUMeshTables,
    num_tris: int,
    padded_tris: int,
    ro: Vec3,
    rd: Vec3,
    active: jnp.ndarray,
    t_limit: jnp.ndarray,
    baby_eps: float,
    sort_rays: bool = False,
    sort_bits: int = 3,
    sort_dir_bits: int = 3,
    mesh_bounds: tuple = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0),
    interpret: bool = False,
    compute_uv: bool = True,
    planned: bool = False,
    sort_mode: str = "morton",
    streamed: bool = False,
    binned: bool = False,
    binned_tiers: tuple = None,
    binned_topk: int = None,
    binned_budget_rays: int = None,
    plan_frustum: bool = False,
    plan_impl: str = None,  # None = env PTT_PLAN_IMPL
    planned_epilogue: str = None,  # None = env PTT_PLANNED_EPILOGUE
    mono: bool = False,
    sort_key: jnp.ndarray = None,  # precomputed coherence key (sort_rays)
) -> MeshHit:
    """Closest hit over the mesh.  The returned (u, v) are recomputed from
    the winner's geometry (attrs rows) with the standard Moller-Trumbore
    formulas -- identical to the brute-force oracle's arithmetic.  Callers
    that resolve attributes anyway pass ``compute_uv=False`` and call
    ``winner_uv`` with the resolved rows (saves a gather)."""
    # Fusion-isolate the traversal subgraph: its inputs are barriered so
    # every SHARED producer (prim_t_min's t_limit, the path-state planes
    # that also feed the fused shade) sees an identical consumer shape no
    # matter which traversal runs -- otherwise the compiler's contraction
    # choices for those producers follow the consuming graph and 1-ulp
    # value drift leaks into everything else that reads them (observed in
    # interpret mode: lanebest-planned vs binned full renders diverged on
    # ~6% of pixels while ALL traversals' intersect outputs were bit-equal
    # on the same states).  Outputs are barriered below for the same
    # reason.  On TPU the pallas_call is already a fusion boundary.
    (rox, roy, roz, rdx, rdy, rdz, active, t_limit) = (
        jax.lax.optimization_barrier(
            (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, active, t_limit)
        )
    )
    t, tri = _run(
        tables.features,
        tables.tile_aabb,
        tables.group_aabb,
        tables.center,
        rox, roy, roz, rdx, rdy, rdz, active, t_limit,
        num_tris=num_tris,
        padded_tris=padded_tris,
        baby_eps=baby_eps,
        sort_rays=sort_rays,
        sort_bits=sort_bits,
        sort_dir_bits=sort_dir_bits,
        mesh_bounds=mesh_bounds,
        interpret=interpret,
        planned=planned,
        sort_mode=sort_mode,
        streamed=streamed,
        binned=binned,
        binned_tiers=binned_tiers,
        binned_topk=binned_topk,
        binned_budget_rays=binned_budget_rays,
        plan_frustum=plan_frustum,
        plan_impl=(
            plan_impl
            if plan_impl is not None
            else os.environ.get("PTT_PLAN_IMPL", "xla")
        ),
        planned_epilogue=(
            planned_epilogue
            if planned_epilogue is not None
            else os.environ.get("PTT_PLANNED_EPILOGUE", "lanebest")
        ),
        mono=mono,
        sort_key=sort_key,
    )
    # Pin the winner values at the traversal boundary: downstream shade
    # math must not re-fuse/contract differently depending on which
    # traversal PRODUCED (t, tri) -- in interpret mode the kernels inline
    # as jnp and the compiler's FMA choices follow the producer's graph
    # shape (observed: lanebest-planned vs binned full renders diverged by
    # 1 ulp on ~6% of pixels while their intersect outputs were bit-equal;
    # same mechanism as the material-sort repack barrier in
    # ops/compaction.py).  On TPU a pallas_call is already a fusion
    # boundary, so this costs nothing.
    t, tri = jax.lax.optimization_barrier((t, tri))
    if compute_uv:
        u, v = winner_uv(tables, padded_tris, tri, ro, rd, baby_eps)
    else:
        u = v = jnp.zeros_like(t)
    return MeshHit(t=t, tri=tri, u=u, v=v)


def winner_uv(
    tables: MXUMeshTables,
    padded_tris: int,
    tri: jnp.ndarray,
    ro: Vec3,
    rd: Vec3,
    baby_eps: float,
    attr_rows: jnp.ndarray | None = None,
):
    """Per-ray (u, v) of the winning triangle via elementwise MT (one row
    gather; reuse ``attr_rows`` if the caller already resolved attributes)."""
    if attr_rows is None:
        attr_rows = resolve_attributes(tables, padded_tris, tri, mode="gather")
    return winner_uv_from_geom(
        attr_rows[:, 24:27], attr_rows[:, 27:30], attr_rows[:, 30:33],
        tri, ro, rd, baby_eps,
    )


def winner_uv_from_geom(v0, e1, e2, tri, ro, rd, baby_eps):
    """(u, v) of the winning triangle from its (v0, e1, e2) rows."""
    d = jnp.stack([rd.x, rd.y, rd.z], axis=-1)
    o = jnp.stack([ro.x, ro.y, ro.z], axis=-1)
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_ok = jnp.abs(det) >= baby_eps
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    miss = tri < 0
    return jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v)


def resolve_attributes(
    tables: MXUMeshTables, padded_tris: int, tri: jnp.ndarray, mode: str = "onehot"
):
    """Per-ray triangle attributes -> [N, 24] rows (zero rows for tri == -1).

    ``mode="onehot"``: one one-hot matmul on the MXU (2*N*Tp*24 flops) --
    no gathers, but the flop cost scales with the triangle count.
    ``mode="gather"``: one [Tp, 24] row gather -- flat cost in Tp, the only
    viable option for large meshes (the one-hot matmul at 80k tris is
    ~2.5 TFLOP per bounce).
    """
    tp = padded_tris
    if mode == "gather":
        safe = jnp.clip(tri, 0, tp - 1)
        rows = tables.attrs[safe]
        return jnp.where((tri >= 0)[:, None], rows, 0.0)
    safe = jnp.clip(tri, 0, tp - 1)
    onehot = jax.nn.one_hot(jnp.where(tri >= 0, safe, tp), tp, dtype=jnp.float32)
    # note: tri == -1 maps past the table -> one_hot gives an all-zero row
    return jnp.dot(onehot, tables.attrs, preferred_element_type=jnp.float32)


def resolve_shade_attributes(
    tables: MXUMeshTables, padded_tris: int, tri: jnp.ndarray
):
    """Slim per-ray rows for the untextured fused path: [N, 24] with
    n0 n1 n2 (0:9), mat (9), v0 e1 e2 (10:19).  40% less gather traffic
    than the full attrs rows."""
    tp = padded_tris
    safe = jnp.clip(tri, 0, tp - 1)
    rows = tables.attrs_shade[safe]
    return jnp.where((tri >= 0)[:, None], rows, 0.0)
