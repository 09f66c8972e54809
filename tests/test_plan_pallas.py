"""Pallas plan-prepass kernel vs the XLA exact tile-plan builder.

The XLA exact plan (`_build_tile_plan`) is O(N*Ct) with [n, TC] HBM
intermediates per tile chunk -- the linear-in-tiles term of the heavy-mesh
frame (measured 3.6 ms/bounce at just FIVE tiles on v5e).  The Pallas
builder keeps each 256-ray block VMEM-resident and broadcasts it over all
tiles at once, so its traffic is read-rays-once + write [NB, Ct] --
independent of Ct.  Both compute the identical widened-slab candidate
test (k=2; module candidate-set contract), so the plans must agree on
candidate SETS and entry keys; interpret mode makes the comparison exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m


def _population(rng, n, ct, dead_frac=0.3):
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # a few axis-aligned rays exercise the d==0 reciprocal path
    d[: n // 16, 0] = 0.0
    one = (rng.uniform(size=n) > dead_frac).astype(np.float32)
    tl = rng.uniform(1, 100, (n,)).astype(np.float32)
    rayf = np.zeros((n, m.NUM_F), np.float32)
    rayf[:, 0:3] = d * one[:, None]
    rayf[:, 6:9] = o * one[:, None]
    rayf[:, 9] = one
    lo = rng.uniform(-6, 4, (ct, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.5, 4, (ct, 3)).astype(np.float32)
    aabb = np.concatenate([lo, hi, np.zeros((ct, 2), np.float32)], axis=1)
    return rayf, tl[:, None], aabb


@pytest.mark.parametrize("ct", [3, 7, 129])
def test_plan_pallas_matches_xla(ct):
    rng = np.random.default_rng(11 + ct)
    n = 4 * m.RAY_TILE
    rayf, tlim, aabb = _population(rng, n, ct)

    ids_x, tlo_x, cnt_x = jax.jit(m._build_tile_plan)(
        aabb, rayf[:, 6:9], rayf[:, 0:3], rayf[:, 9], tlim[:, 0]
    )
    ids_p, tlo_p, cnt_p = jax.jit(
        lambda a, r, t: m._build_tile_plan_pallas(a, r, t, interpret=True)
    )(aabb, rayf, tlim)

    np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
    ids_x = np.asarray(ids_x).reshape(-1, ct)
    ids_p = np.asarray(ids_p).reshape(-1, ct)
    tlo_xr = np.asarray(tlo_x).reshape(-1, ct)
    tlo_pr = np.asarray(tlo_p).reshape(-1, ct)
    cnt = np.asarray(cnt_x)
    for b in range(ids_x.shape[0]):
        k = int(cnt[b])
        # candidate SETS must match; order may differ only among equal keys
        assert set(ids_x[b, :k]) == set(ids_p[b, :k])
        np.testing.assert_array_equal(tlo_xr[b, :k], tlo_pr[b, :k])
        # misses padded with +inf beyond cnt
        assert np.all(np.isinf(tlo_pr[b, k:]))


def test_plan_pallas_in_planned_traversal_bitexact():
    """Full planned traversal with the Pallas plan == XLA plan (interpret)."""
    from tests.test_intersect import _random_mesh_scene
    from project3_cuda_path_tracer_2025_tpu.scene.device import (
        build_device_scene,
    )
    from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3
    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig

    rng = np.random.default_rng(7)
    scene = _random_mesh_scene(rng, n_tris=2200)
    dev, static = build_device_scene(scene)
    n = 900
    origins = rng.normal(size=(n, 3))
    origins = 3.0 * origins / np.linalg.norm(origins, axis=1, keepdims=True)
    dirs = rng.uniform(-0.8, 0.8, (n, 3)) - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ro = Vec3(*[jnp.asarray(origins[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(dirs[:, i], jnp.float32) for i in range(3)])
    active = jnp.asarray(rng.random(n) > 0.1)
    lim = jnp.full((n,), 3.4e38, jnp.float32)
    cfg = RenderConfig()

    outs = []
    for impl, kw in (
        ("xla", dict(planned=True)),
        ("pallas", dict(planned=True)),
        ("pallas", dict(streamed=True)),
    ):
        out = m.mesh_intersect_mxu(
            dev.mxu_mesh, static.num_triangles, static.mxu_padded_tris,
            ro, rd, active, lim, cfg.baby_epsilon, interpret=True,
            plan_impl=impl, **kw,
        )
        outs.append((np.asarray(out.t), np.asarray(out.tri)))
    for t, tri in outs[1:]:
        np.testing.assert_array_equal(outs[0][1], tri)
        np.testing.assert_array_equal(outs[0][0], t)
