"""MXU (block-sparse matmul) intersector vs the brute-force oracle, plus
end-to-end render equality (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
from project3_cuda_path_tracer_2025_tpu.ops.intersect import mesh_intersect_brute
from project3_cuda_path_tracer_2025_tpu.ops.intersect_mxu import (
    build_mxu_tables,
    mesh_intersect_mxu,
    resolve_attributes,
    GROUP_TILES,
    GROUP_TRIS,
)
from project3_cuda_path_tracer_2025_tpu.scene.device import build_device_scene
from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3

from tests.test_intersect import _random_mesh_scene

CFG = RenderConfig()


def _rays(rng, n):
    origins = rng.normal(size=(n, 3))
    origins = 3.0 * origins / np.linalg.norm(origins, axis=1, keepdims=True)
    dirs = rng.uniform(-0.8, 0.8, (n, 3)) - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ro = Vec3(*[jnp.asarray(origins[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(dirs[:, i], jnp.float32) for i in range(3)])
    return ro, rd


def test_mxu_matches_brute_force():
    rng = np.random.default_rng(21)
    scene = _random_mesh_scene(rng, n_tris=150)
    dev, static = build_device_scene(scene)
    assert static.mxu_padded_tris == (
        (150 + GROUP_TRIS - 1) // GROUP_TRIS
    ) * GROUP_TRIS

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.05)
    lim = jnp.full((n,), 3.4e38, jnp.float32)

    ref = mesh_intersect_brute(dev, static, ro, rd, active, lim, CFG.baby_epsilon)
    out = mesh_intersect_mxu(
        dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
        ro, rd, active, lim, CFG.baby_epsilon, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(out.tri), np.asarray(ref.tri))
    hit = np.asarray(ref.tri) >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(
        np.asarray(out.t)[hit], np.asarray(ref.t)[hit], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.u)[hit], np.asarray(ref.u)[hit], atol=2e-5
    )
    inact = ~np.asarray(active)
    assert (np.asarray(out.tri)[inact] == -1).all()


def test_mxu_sorted_bitexact():
    """Ray-coherence sorting is a pure permutation around the kernel: every
    per-ray output must be bit-identical with sorting on vs off."""
    rng = np.random.default_rng(33)
    scene = _random_mesh_scene(rng, n_tris=150)
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)  # plenty of dead rays too
    lim = jnp.full((n,), 3.4e38, jnp.float32)

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    base = mesh_intersect_mxu(
        dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
        ro, rd, active, lim, sort_rays=False, **kw,
    )
    for mode in ("morton", "signature"):
        srt = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=True, sort_mode=mode, **kw,
        )
        np.testing.assert_array_equal(np.asarray(srt.tri), np.asarray(base.tri))
        np.testing.assert_array_equal(np.asarray(srt.t), np.asarray(base.t))
        np.testing.assert_array_equal(np.asarray(srt.u), np.asarray(base.u))
        np.testing.assert_array_equal(np.asarray(srt.v), np.asarray(base.v))
        assert (np.asarray(srt.tri)[~np.asarray(active)] == -1).all()


def test_mxu_chunked_matches_single():
    """>chunk_tris meshes run as a chunked multi-call chain; results must be
    bit-identical to the single-call path (and match brute force)."""
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m

    rng = np.random.default_rng(44)
    scene = _random_mesh_scene(rng, n_tris=150)
    dev, static = build_device_scene(scene)
    # padded_tris is a multiple of GROUP_TRIS (the chunking unit); chunk at
    # one group per chunk so the 150-tri scene (padded to >=GROUP_TRIS) still
    # exercises the chain when GROUP_TRIS < padded_tris, and the merge logic
    # in all cases.
    n = 500
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.1)
    lim = jnp.full((n,), 3.4e38, jnp.float32)

    args = (dev.mxu_mesh.features, dev.mxu_mesh.tile_aabb,
            dev.mxu_mesh.group_aabb, dev.mxu_mesh.center,
            ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, active, lim)
    kw = dict(num_tris=static.num_triangles, padded_tris=static.mxu_padded_tris,
              baby_eps=CFG.baby_epsilon, interpret=True)
    single = m._run(*args, **kw)
    # force chunking: one group per chunk (no-op if only one group, so pad
    # the table up to two groups in that case)
    if static.mxu_padded_tris > GROUP_TRIS:
        chunked = m._run(*args, chunk_tris=GROUP_TRIS, **kw)
    else:
        # synthesize a 2-group table by repeating the features columns
        feats2 = jnp.concatenate(
            [dev.mxu_mesh.features, dev.mxu_mesh.features * 0.0], axis=1
        )
        never = jnp.full((1, 8), 1e30, jnp.float32).at[0, 3:6].set(-1e30)
        aabb2 = jnp.concatenate(
            [dev.mxu_mesh.tile_aabb, jnp.tile(never, (GROUP_TILES, 1))], axis=0
        )
        gaabb2 = jnp.concatenate([dev.mxu_mesh.group_aabb, never], axis=0)
        args2 = (feats2, aabb2, gaabb2) + args[3:]
        kw2 = dict(kw, padded_tris=2 * GROUP_TRIS)
        single = m._run(*args2, **kw2)
        chunked = m._run(*args2, chunk_tris=GROUP_TRIS, **kw2)
    for a, b in zip(single, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mxu_chunked_sorted_bitexact():
    """Chunked chain with sort_rays=True: the chunk-envelope cull must see
    the SAME (sorted) ray order as the features it masks -- a regression
    test for the round-2 bug where ctlo/cthi were computed from the
    unsorted origins and zeroed the wrong rays' features."""
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m

    rng = np.random.default_rng(46)
    scene = _random_mesh_scene(rng, n_tris=150)
    dev, static = build_device_scene(scene)
    n = 500
    ro, rd = _rays(rng, n)
    # A third of the rays point AWAY from the mesh (miss the envelope) and
    # some t_limits are too short to reach it: the cull mask then genuinely
    # varies per ray, so order mixups between the mask and the (sorted)
    # features show up as dropped hits.  (With every ray hitting the
    # envelope the mask is all-True and the bug is invisible.)
    away = jnp.asarray(rng.random(n) < 0.33)
    # outward radial direction from a radius-3 origin: provably exits the
    # scene box without entering it
    rd = Vec3(
        jnp.where(away, ro.x / 3.0, rd.x),
        jnp.where(away, ro.y / 3.0, rd.y),
        jnp.where(away, ro.z / 3.0, rd.z),
    )
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, np.where(rng.random(n) > 0.5, 2.0, 0.5)),
        jnp.float32,
    )

    # Synthesize a 2-group table so the chain actually chunks: group 1 is
    # all-zero features with a never-hit AABB (envelope cull must kill it).
    feats2 = jnp.concatenate(
        [dev.mxu_mesh.features, dev.mxu_mesh.features * 0.0], axis=1
    )
    never = jnp.full((1, 8), 1e30, jnp.float32).at[0, 3:6].set(-1e30)
    aabb2 = jnp.concatenate(
        [dev.mxu_mesh.tile_aabb, jnp.tile(never, (GROUP_TILES, 1))], axis=0
    )
    gaabb2 = jnp.concatenate([dev.mxu_mesh.group_aabb, never], axis=0)
    args = (feats2, aabb2, gaabb2, dev.mxu_mesh.center,
            ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, active, lim)
    kw = dict(num_tris=static.num_triangles, padded_tris=2 * GROUP_TRIS,
              baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    base = m._run(*args, sort_rays=False, **kw)
    for planned in (False, True):
        got = m._run(
            *args, sort_rays=True, planned=planned,
            chunk_tris=GROUP_TRIS, **kw,
        )
        for a, b in zip(base, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mxu_attr_resolve_gather_matches_onehot():
    rng = np.random.default_rng(45)
    scene = _random_mesh_scene(rng, n_tris=100)
    dev, static = build_device_scene(scene)
    tri = jnp.asarray(rng.integers(-1, 100, 300), jnp.int32)
    a = resolve_attributes(dev.mxu_mesh, static.mxu_padded_tris, tri, "onehot")
    b = resolve_attributes(dev.mxu_mesh, static.mxu_padded_tris, tri, "gather")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_mxu_attribute_resolve():
    rng = np.random.default_rng(22)
    scene = _random_mesh_scene(rng, n_tris=100)
    dev, static = build_device_scene(scene)
    tri = jnp.asarray([-1, 0, 57, 99], jnp.int32)
    at = np.asarray(resolve_attributes(dev.mxu_mesh, static.mxu_padded_tris, tri))
    assert (at[0] == 0).all()  # miss row zero
    order = scene.bvh.tri_indices
    mats = scene.tri_material_ids[order]
    np.testing.assert_array_equal(at[1:, 21].astype(int), mats[[0, 57, 99]])


def test_mxu_render_matches_threaded(tmp_path):
    """Full-iteration image agreement between intersector backends."""
    import json

    obj = tmp_path / "m.obj"
    rng = np.random.default_rng(5)
    lines = []
    nv = 0
    for i in range(60):
        p = rng.uniform(-1, 1, 3)
        for dv in np.eye(3) * 0.3:
            q = p + dv
            lines.append(f"v {q[0]:.5f} {q[1]:.5f} {q[2]:.5f}")
        lines.append(f"f {nv+1} {nv+2} {nv+3}")
        nv += 3
    obj.write_text("\n".join(lines) + "\n")
    scene_file = tmp_path / "s.json"
    json.dump(
        {
            "Materials": {
                "light": {"TYPE": "Emitting", "RGB": [1, 1, 1], "EMITTANCE": 5.0},
                "w": {"TYPE": "Diffuse", "RGB": [0.8, 0.7, 0.6]},
            },
            "Camera": {
                "RES": [24, 24], "FOVY": 35.0, "ITERATIONS": 2, "DEPTH": 3,
                "FILE": "m", "EYE": [0, 0, 5], "LOOKAT": [0, 0, 0],
                "UP": [0, 1, 0], "APERTURE": 0.0,
            },
            "Objects": [
                {"TYPE": "obj", "PATH": "m.obj", "MATERIAL": "w",
                 "TRANS": [0, 0, 0], "ROTAT": [0, 0, 0], "SCALE": [1, 1, 1]},
                {"TYPE": "cube", "MATERIAL": "light",
                 "TRANS": [0, 3, 0], "ROTAT": [0, 0, 0], "SCALE": [3, 0.2, 3]},
            ],
        },
        scene_file.open("w"),
    )
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene

    scene = load_scene(str(scene_file))

    def film(mode):
        r = Renderer(scene, RenderConfig(mesh_intersector=mode))
        for _ in range(2):
            r.step()
        return r.image()

    a = film("threaded")
    b = film("mxu")
    # identical hits; f32 roundoff differs between formulations
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    assert a.mean() > 0.001


def test_mxu_planned_matches_sweep_bitexact():
    """The planned front-to-back traversal (XLA candidate-tile plan +
    scalar-prefetch kernel with early exit) must be bit-identical to the
    sweep kernel: winner selection is visit-order independent (strict
    improvement + lowest-triangle-id tie-break) and the early exit uses a
    strict bound, so no hit or exact tie can be skipped.  Covers finite
    t_limits (prim pruning) and the chunked chain."""
    rng = np.random.default_rng(44)
    scene = _random_mesh_scene(rng, n_tris=150)
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    for sort in (False, True):
        sweep = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=False, **kw,
        )
        plan = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(plan.tri), np.asarray(sweep.tri))
        np.testing.assert_array_equal(np.asarray(plan.t), np.asarray(sweep.t))

    # chunked planned chain (one group per chunk)
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m

    args = (dev.mxu_mesh.features, dev.mxu_mesh.tile_aabb,
            dev.mxu_mesh.group_aabb, dev.mxu_mesh.center,
            ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, active, lim)
    kw2 = dict(num_tris=static.num_triangles,
               padded_tris=static.mxu_padded_tris,
               baby_eps=CFG.baby_epsilon, interpret=True)
    t0, tri0 = m._run(*args, planned=False, **kw2)
    t1, tri1 = m._run(*args, planned=True, chunk_tris=m.GROUP_TRIS, **kw2)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_mxu_streamed_matches_sweep_bitexact():
    """The streamed traversal (HBM-resident features DMA'd per candidate
    tile, global front-to-back early exit) must be bit-identical to the
    sweep kernel -- the per-ray candidate contract (module docstring of
    ops/intersect_mxu.py) makes this structural: membership and accepted-t
    confinement are ray-local, so block/chunk/visit-order differences
    cannot change any ray's winner.  Covers sorted + finite t_limits."""
    rng = np.random.default_rng(47)
    scene = _random_mesh_scene(rng, n_tris=300)
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    for sort in (False, True):
        sweep = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=False, **kw,
        )
        strm = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, streamed=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(strm.tri), np.asarray(sweep.tri))
        np.testing.assert_array_equal(np.asarray(strm.t), np.asarray(sweep.t))


def test_mxu_binned_matches_sweep_bitexact():
    """The packet-binned traversal (tile-major visits over G-ray packet
    bins, XLA scatter-min reduce) must be bit-identical to the sweep --
    the candidate contract again: bins are k=2 supersets, every pair row
    applies the k=1 member test, and the reduce implements the exact
    (min t, lowest tri) winner rule.  Covers the engaged path (live rays
    inside the prefix after sorting) and the liveness fallback."""
    rng = np.random.default_rng(48)
    scene = _random_mesh_scene(rng, n_tris=300)
    dev, static = build_device_scene(scene)

    n = 1100
    ro, rd = _rays(rng, n)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )
    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as _m

    # (tiers, live_frac, sort): single-tier engaged, single-tier liveness
    # fallback, and the multi-tier chain (a mid tier engages at 0.4, the
    # full-prefix tier at 0.9 sorted and unsorted).  Tiers go through the
    # EXPLICIT static arg (binned_tiers): monkey-patching the module
    # default would be defeated by _run's jit cache (same avals + same
    # static args reuse the first trace).
    cases = (
        ((4,), 0.15, True),
        ((4,), 0.9, True),
        ((4, 2, 1), 0.4, True),
        ((4, 2, 1), 0.9, True),
        ((4, 2, 1), 0.9, False),
    )
    for tiers, live_frac, sort in cases:
        active = jnp.asarray(rng.random(n) < live_frac)
        sweep = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=False, **kw,
        )
        binned = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=True,
            streamed=True, binned=True, binned_tiers=tiers, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(binned.tri), np.asarray(sweep.tri)
        )
        np.testing.assert_array_equal(
            np.asarray(binned.t), np.asarray(sweep.t)
        )

    # Top-K bin construction (scatter-input compaction): same contract,
    # needs a multi-tile mesh so K < Ct actually engages, plus the
    # K-overflow fallback (K=1 with 3 tiles overflows for some packet).
    scene3 = _random_mesh_scene(rng, n_tris=2500)
    dev3, static3 = build_device_scene(scene3)
    active = jnp.asarray(rng.random(n) < 0.9)
    sweep = mesh_intersect_mxu(
        dev3.mxu_mesh, static3.num_triangles, static3.mxu_padded_tris,
        ro, rd, active, lim, sort_rays=True, planned=False,
        baby_eps=CFG.baby_epsilon, interpret=True,
        mesh_bounds=static3.mesh_bounds,
    )
    for k in (2, 1):
        binned = mesh_intersect_mxu(
            dev3.mxu_mesh, static3.num_triangles,
            static3.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=True, planned=True,
            streamed=True, binned=True, binned_topk=k,
            baby_eps=CFG.baby_epsilon, interpret=True,
            mesh_bounds=static3.mesh_bounds,
        )
        np.testing.assert_array_equal(
            np.asarray(binned.tri), np.asarray(sweep.tri)
        )
        np.testing.assert_array_equal(
            np.asarray(binned.t), np.asarray(sweep.t)
        )

    # Engaged top-K construction must reproduce the dense scatter's bins
    # exactly (same src and visit tables) when no packet overflows K.
    scene20 = _random_mesh_scene(rng, n_tris=9000)
    dev20, static20 = build_device_scene(scene20)
    ct = dev20.mxu_mesh.tile_aabb.shape[0]
    assert ct >= 4
    n_pad = ((n + _m.RAY_TILE - 1) // _m.RAY_TILE) * _m.RAY_TILE
    pad = lambda x, f=0.0: jnp.pad(x, (0, n_pad - n), constant_values=f)
    c = dev20.mxu_mesh.center
    # Narrow-corridor rays (+x toward a band of the mesh) so packets hit a
    # strict subset of tiles; random directions would union every tile.
    lo3 = np.asarray(static20.mesh_bounds[:3])
    hi3 = np.asarray(static20.mesh_bounds[3:])
    oy = lo3[1] + (hi3[1] - lo3[1]) * rng.random(n) * 0.2
    oz = lo3[2] + (hi3[2] - lo3[2]) * rng.random(n) * 0.2
    ro = type(ro)(
        jnp.asarray(np.full(n, lo3[0] - 1.0), jnp.float32),
        jnp.asarray(oy, jnp.float32),
        jnp.asarray(oz, jnp.float32),
    )
    rd = type(rd)(
        jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    osx, osy, osz = pad(ro.x) - c[0], pad(ro.y) - c[1], pad(ro.z) - c[2]
    dx, dy, dz = pad(rd.x), pad(rd.y), pad(rd.z)
    one = pad(active.astype(jnp.float32))
    rayf = jnp.stack(
        [dx * one, dy * one, dz * one,
         (osy * dz - osz * dy) * one, (osz * dx - osx * dz) * one,
         (osx * dy - osy * dx) * one,
         osx * one, osy * one, osz * one, one]
        + [jnp.zeros_like(one)] * 6,
        axis=1,
    )
    tlimp = pad(lim, 3.4e38)[:, None]
    g = _m.BINNED_G
    gp = _m.RAY_TILE // g
    n_g = n_pad // g
    budget = (
        (n_g * min(_m.BINNED_PAIR_MEAN, ct) + gp * ct + gp - 1) // gp
    ) * gp
    aabb = dev20.mxu_mesh.tile_aabb
    src_d, vt_d, dst_d, ovf_d = _m._packet_bins(aabb, rayf, tlimp, budget, 0)
    assert dst_d is None and not bool(np.asarray(ovf_d))
    engaged = False
    for k in range(ct - 1, 0, -1):
        src_k, vt_k, dst_k, ovf_k = _m._packet_bins(
            aabb, rayf, tlimp, budget, k
        )
        if bool(np.asarray(ovf_k)):
            break
        engaged = True
        np.testing.assert_array_equal(
            np.asarray(src_k), np.asarray(src_d)
        )
        np.testing.assert_array_equal(
            np.asarray(vt_k), np.asarray(vt_d)
        )
        # dst must list exactly the slots that scatter into src: slot s
        # with src[s] = i appears in dst row i (ascending, _INT_BIG pads).
        dst_np = np.asarray(dst_k)
        src_np = np.asarray(src_d)
        n_g = dst_np.shape[0]
        for i in range(0, n_g, max(1, n_g // 13)):
            expect = np.where(src_np == i)[0]
            got = dst_np[i][dst_np[i] < _m._INT_BIG]
            np.testing.assert_array_equal(np.sort(got), expect)
    assert engaged, "no K < Ct engaged without overflow"


def test_auto_traversal_policy():
    """"auto" resolves per mesh size: planned while VMEM-resident, binned
    only inside its measured winning band, streamed everywhere else
    (PARITY.md round-3 campaign: 659 vs 917 ms at 200k, but binned LOSES
    at 80k and 500k)."""
    from project3_cuda_path_tracer_2025_tpu.ops.intersect_mxu import (
        BINNED_AUTO_MAX,
        BINNED_AUTO_MIN,
        CHUNK_TRIS,
        resolve_traversal_mode,
        traversal_flags,
    )

    assert resolve_traversal_mode("auto", CHUNK_TRIS) == "planned"
    assert resolve_traversal_mode("auto", CHUNK_TRIS + 1024) == "streamed"
    assert resolve_traversal_mode("auto", 80 * 1024) == "streamed"
    assert resolve_traversal_mode("auto", 200_704) == "binned"  # 200k scene
    assert resolve_traversal_mode("auto", BINNED_AUTO_MAX + 1024) == "streamed"
    assert BINNED_AUTO_MIN > 80 * 1024  # 80k scene stays streamed
    # explicit modes pass through untouched
    for m in ("sweep", "planned", "streamed", "binned"):
        assert resolve_traversal_mode(m, 200_704) == m
    # flags for auto-in-band match explicit binned
    assert traversal_flags("auto", 200_704) == traversal_flags(
        "binned", 200_704
    )
    with pytest.raises(ValueError):
        traversal_flags("bogus", 1024)


def test_mxu_frustum_plan_bitexact():
    """The block-frustum tile plan (interval-arithmetic slabs on per-block
    ray envelopes) must be bit-identical to the exact per-ray plan for
    BOTH ordered walks: it is a conservative superset of the exact plan's
    candidate sets with a true lower-bound entry ordering, and the
    kernels' per-ray member test gates every evaluation (the candidate
    contract).  Covers sorted + unsorted states (unsorted envelopes are
    scene-wide but still correct) and finite t_limits."""
    rng = np.random.default_rng(49)
    scene = _random_mesh_scene(rng, n_tris=300)
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    for sort in (False, True):
        for mode in (dict(planned=True), dict(streamed=True)):
            exact = mesh_intersect_mxu(
                dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
                ro, rd, active, lim, sort_rays=sort,
                plan_frustum=False, **mode, **kw,
            )
            fru = mesh_intersect_mxu(
                dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
                ro, rd, active, lim, sort_rays=sort,
                plan_frustum=True, **mode, **kw,
            )
            np.testing.assert_array_equal(
                np.asarray(fru.tri), np.asarray(exact.tri)
            )
            np.testing.assert_array_equal(
                np.asarray(fru.t), np.asarray(exact.t)
            )


def test_mxu_planned_lanebest_multitile_bitexact():
    """The lane-best planned epilogue (per-lane running minima, one
    end-of-walk winner resolve) must match the running-best epilogue and
    the sweep kernel bit-for-bit ACROSS TILES -- the cross-tile tie rule
    (lowest tile per lane, then lowest global tri across lanes) and the
    per-visit accumulation are only exercised with > 1 tile (> 1024
    triangles; the other planned tests use single-tile meshes)."""
    rng = np.random.default_rng(50)
    scene = _random_mesh_scene(rng, n_tris=2300)  # 3 tiles of 1024
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds, planned=True)
    for sort in (False, True):
        run = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort,
            planned_epilogue="running", **kw,
        )
        lb = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort,
            planned_epilogue="lanebest_force", **kw,
        )
        np.testing.assert_array_equal(np.asarray(lb.tri), np.asarray(run.tri))
        np.testing.assert_array_equal(np.asarray(lb.t), np.asarray(run.t))


def test_mxu_mono_multitile_bitexact():
    """The plan-free MONO traversal (static unroll over every tile,
    strict-< lane-best, block-live skip -- ops/intersect_mxu._mono_kernel)
    must match the planned walk bit-for-bit: ascending-tile visits make
    first-win == the contract's lowest-tile tie rule, and the per-ray
    member windows confine hits identically.  Multi-tile mesh so cross-
    tile accumulation and the tie rule are exercised; sorted + unsorted;
    finite t_limits."""
    rng = np.random.default_rng(51)
    scene = _random_mesh_scene(rng, n_tris=2300)  # 3 tiles of 1024
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds, planned=True)
    for sort in (False, True):
        ref = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort,
            planned_epilogue="running", **kw,
        )
        mono = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, mono=True,
            planned_epilogue="mono_force", **kw,
        )
        np.testing.assert_array_equal(np.asarray(mono.tri), np.asarray(ref.tri))
        np.testing.assert_array_equal(np.asarray(mono.t), np.asarray(ref.t))
    # interpret WITHOUT the force flag falls back to the planned walk
    # (fusion-leak gate) -- still bit-identical, exercising the fallback
    fb = mesh_intersect_mxu(
        dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
        ro, rd, active, lim, sort_rays=False, mono=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(fb.tri), np.asarray(ref.tri))


def test_mxu_streamed_super_bitexact(monkeypatch):
    """The SUPER-tile streamed walk (one plan row / DMA / early-exit
    decision per SUPER_TILES tiles, static inner unroll --
    _streamed_super_kernel) must match the planned walk bit-for-bit: the
    super plan is a candidate superset with true lower-bound ordering and
    every tile runs the shared member-window epilogue.  Odd tile count
    exercises the wrapper's never-hit padding."""
    import project3_cuda_path_tracer_2025_tpu.ops.intersect_mxu as mxu

    monkeypatch.setenv("PTT_STREAM_SUPER", "1")
    rng = np.random.default_rng(52)
    scene = _random_mesh_scene(rng, n_tris=2300)  # 3 tiles -> pads to 8
    dev, static = build_device_scene(scene)

    n = 700
    ro, rd = _rays(rng, n)
    active = jnp.asarray(rng.random(n) > 0.3)
    lim = jnp.asarray(
        np.where(rng.random(n) > 0.5, 3.4e38, 2.0), jnp.float32
    )

    kw = dict(baby_eps=CFG.baby_epsilon, interpret=True,
              mesh_bounds=static.mesh_bounds)
    for sort in (False, True):
        ref = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=True,
            planned_epilogue="running", **kw,
        )
        sup = mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, sort_rays=sort, planned=True,
            streamed=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(sup.tri), np.asarray(ref.tri))
        np.testing.assert_array_equal(np.asarray(sup.t), np.asarray(ref.t))
