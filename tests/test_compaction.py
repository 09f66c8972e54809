"""Compaction / sort primitives vs NumPy oracles (the reference's thrust
calls, src/pathtrace.cu:730-757)."""

import numpy as np

import jax.numpy as jnp

from project3_cuda_path_tracer_2025_tpu.ops.compaction import (
    compact_paths,
    front_pack_permutation,
    sort_paths_by_material,
)
from project3_cuda_path_tracer_2025_tpu.ops.rays import Intersections, PathState
from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3


def _paths(bounces, n=None):
    bounces = np.asarray(bounces, np.int32)
    n = len(bounces)
    idx = np.arange(n, dtype=np.int32)
    mk = lambda off: Vec3(
        jnp.asarray(idx + off, jnp.float32),
        jnp.asarray(idx + off + 0.5, jnp.float32),
        jnp.asarray(idx + off + 0.25, jnp.float32),
    )
    return PathState(
        origin=mk(0),
        direction=mk(100),
        color=mk(200),
        pixel=jnp.asarray(idx),
        bounces=jnp.asarray(bounces),
    )


def test_front_pack_stable_partition():
    rng = np.random.default_rng(0)
    alive = rng.random(257) > 0.4
    perm, live = front_pack_permutation(jnp.asarray(alive))
    perm = np.asarray(perm)
    assert int(live) == alive.sum()
    # stable: live indices in original order first, then dead in order
    expect = np.concatenate([np.nonzero(alive)[0], np.nonzero(~alive)[0]])
    np.testing.assert_array_equal(perm, expect)


def test_compact_paths_preserves_all_slots():
    bounces = [0, 3, 0, 2, 5, 0, 1]
    p = _paths(bounces)
    packed, live = compact_paths(p)
    assert int(live) == 4
    got = np.asarray(packed.pixel)
    np.testing.assert_array_equal(got, [1, 3, 4, 6, 0, 2, 5])
    # SoA fields move together
    np.testing.assert_allclose(np.asarray(packed.color.x), got + 200.0)
    # every original slot still present (finalGather reads all N)
    assert sorted(got.tolist()) == list(range(7))


def test_material_sort_stable():
    n = 128
    rng = np.random.default_rng(1)
    mats = rng.integers(0, 4, n).astype(np.int32)
    p = _paths(np.full(n, 3))
    z = jnp.zeros((n,), jnp.float32)
    isect = Intersections(
        t=jnp.ones((n,)),
        normal=Vec3(z, z, z),
        material_id=jnp.asarray(mats),
        uv_u=z,
        uv_v=z,
        dpdu=Vec3(z, z, z),
        dpdv=Vec3(z, z, z),
        is_triangle=jnp.zeros((n,), bool),
    )
    ps, iss = sort_paths_by_material(p, isect, 4)
    key_out = np.asarray(iss.material_id)
    assert (np.diff(key_out) >= 0).all()
    # stability: equal keys keep original pixel order
    pix = np.asarray(ps.pixel)
    for m in range(4):
        sel = pix[key_out == m]
        np.testing.assert_array_equal(sel, np.sort(sel))
    # paths permuted consistently with intersections
    np.testing.assert_allclose(np.asarray(ps.origin.x), pix.astype(np.float32))
