"""Native C++ BVH builder vs the NumPy fallback.

Tree shapes can differ in intra-node triangle order (swap vs stable
partition), so the contract tested is: identical invariants and identical
closest-hit results through the jnp traversal.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

NATIVE_DIR = Path(__file__).resolve().parent.parent / (
    "project3_cuda_path_tracer_2025_tpu/native"
)


@pytest.fixture(scope="module")
def native_lib():
    if not (NATIVE_DIR / "libbvh_builder.so").exists():
        r = subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr.decode()[:500]}")
    from project3_cuda_path_tracer_2025_tpu.native import bvh_native

    if not bvh_native.available():
        pytest.skip("native lib not loadable")
    return bvh_native


def _random_tris(rng, n):
    centers = rng.uniform(-1, 1, (n, 3))
    offs = rng.uniform(-0.2, 0.2, (n, 2, 3))
    pos = np.stack([centers, centers + offs[:, 0], centers + offs[:, 1]], axis=1)
    return pos.astype(np.float32), pos.mean(axis=1).astype(np.float32)


def test_native_build_invariants(native_lib):
    rng = np.random.default_rng(11)
    verts, cents = _random_tris(rng, 500)
    out = native_lib.build(verts, cents, 4)
    assert out is not None
    m = out["left"].shape[0]
    internal = out["left"] >= 0
    # pre-order: left child is parent + 1
    np.testing.assert_array_equal(
        out["left"][internal], np.nonzero(internal)[0] + 1
    )
    leaf = out["tri_count"] > 0
    assert out["tri_count"].max() <= 4
    assert (internal ^ leaf).all()  # every node is exactly one of the two
    assert sorted(out["tri_indices"].tolist()) == list(range(500))
    # leaf coverage: every triangle in exactly one leaf
    covered = np.zeros(500, np.int32)
    for i in np.nonzero(leaf)[0]:
        s, c = out["start"][i], out["tri_count"][i]
        covered[out["tri_indices"][s : s + c]] += 1
    assert (covered == 1).all()
    # node AABBs contain their subtree triangles (check leaves)
    for i in np.nonzero(leaf)[0][:50]:
        s, c = out["start"][i], out["tri_count"][i]
        tv = verts[out["tri_indices"][s : s + c]].reshape(-1, 3)
        assert (tv >= out["aabb_min"][i] - 1e-5).all()
        assert (tv <= out["aabb_max"][i] + 1e-5).all()


def test_native_matches_numpy_traversal(native_lib):
    """Same closest hits through both builders' trees."""
    import jax.numpy as jnp

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.ops.intersect import mesh_intersect_bvh
    from project3_cuda_path_tracer_2025_tpu.scene import bvh as bvh_mod
    from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3

    rng = np.random.default_rng(12)
    verts, cents = _random_tris(rng, 300)

    native = bvh_mod._finish(native_lib.build(verts, cents, 4), 4)
    numpy_b = bvh_mod._build_numpy(verts, cents, 4)

    def device_mesh(bvh):
        """Build dev/static pair with triangles in the builder's leaf order."""
        from tests.test_intersect import _random_mesh_scene  # reuse scaffolding

        from project3_cuda_path_tracer_2025_tpu.scene.device import (
            build_device_scene,
        )
        from project3_cuda_path_tracer_2025_tpu.scene.types import (
            HostScene,
            Material,
            RenderState,
            Camera,
            empty_triangle_arrays,
        )

        tri = empty_triangle_arrays()
        tri["tri_positions"] = verts
        tri["tri_normals"] = np.zeros_like(verts)
        tri["tri_uvs"] = np.zeros((300, 3, 2), np.float32)
        tri["tri_material_ids"] = np.zeros(300, np.int32)
        tri["tri_centroids"] = cents
        tri["tri_dpdu"] = np.zeros((300, 3), np.float32)
        tri["tri_dpdv"] = np.zeros((300, 3), np.float32)
        scene = HostScene(
            state=RenderState(
                camera=Camera(
                    resolution=np.asarray([2, 2]),
                    position=np.zeros(3),
                    look_at=np.asarray([0, 0, -1.0]),
                    view=np.asarray([0, 0, -1.0]),
                    up=np.asarray([0, 1.0, 0]),
                    right=np.asarray([1.0, 0, 0]),
                    fov=np.asarray([45.0, 45.0]),
                    pixel_length=np.asarray([0.01, 0.01]),
                    aperture=0.0,
                    focal_dist=1.0,
                ),
                iterations=1,
                trace_depth=2,
                image_name="t",
            ),
            materials=[Material(color=np.ones(3))],
            geoms=[],
            textures=[],
            **tri,
        )
        scene.bvh = bvh
        return build_device_scene(scene)

    n_rays = 200
    origins = rng.normal(size=(n_rays, 3))
    origins = 3.0 * origins / np.linalg.norm(origins, axis=1, keepdims=True)
    dirs = rng.uniform(-0.8, 0.8, (n_rays, 3)) - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ro = Vec3(*[jnp.asarray(origins[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(dirs[:, i], jnp.float32) for i in range(3)])
    active = jnp.ones((n_rays,), bool)
    lim = jnp.full((n_rays,), 3.4e38, jnp.float32)

    cfg = RenderConfig()
    results = []
    for b in (native, numpy_b):
        dev, static = device_mesh(b)
        mh = mesh_intersect_bvh(dev, static, ro, rd, active, lim, cfg.baby_epsilon)
        # map leaf-local indices back to original triangle ids
        tri_ids = np.where(
            np.asarray(mh.tri) >= 0,
            b.tri_indices[np.clip(np.asarray(mh.tri), 0, 299)],
            -1,
        )
        results.append((np.asarray(mh.t), tri_ids))

    (t_a, id_a), (t_b, id_b) = results
    hit_a, hit_b = id_a >= 0, id_b >= 0
    np.testing.assert_array_equal(hit_a, hit_b)
    assert hit_a.sum() > 30
    np.testing.assert_allclose(t_a[hit_a], t_b[hit_b], rtol=1e-6)
    np.testing.assert_array_equal(id_a[hit_a], id_b[hit_b])


def test_loader_uses_native_when_available(native_lib, tmp_path):
    import json

    obj = tmp_path / "m.obj"
    lines = ["v 0 0 0", "v 1 0 0", "v 0 1 0"]
    faces = []
    rng = np.random.default_rng(5)
    for i in range(40):
        base = len(lines) // 1
        p = rng.uniform(-1, 1, 3)
        for d in np.eye(3) * 0.2:
            q = p + d
            lines.append(f"v {q[0]} {q[1]} {q[2]}")
        k = 3 + i * 3 + 1
        faces.append(f"f {k} {k+1} {k+2}")
    obj.write_text("\n".join(lines + faces) + "\n")
    scene_file = tmp_path / "s.json"
    json.dump(
        {
            "Materials": {"w": {"TYPE": "Diffuse", "RGB": [1, 1, 1]}},
            "Camera": {
                "RES": [8, 8], "FOVY": 45.0, "ITERATIONS": 1, "DEPTH": 2,
                "FILE": "s", "EYE": [0, 0, 4], "LOOKAT": [0, 0, 0],
                "UP": [0, 1, 0], "APERTURE": 0.0,
            },
            "Objects": [
                {"TYPE": "obj", "PATH": "m.obj", "MATERIAL": "w",
                 "TRANS": [0, 0, 0], "ROTAT": [0, 0, 0], "SCALE": [1, 1, 1]}
            ],
        },
        scene_file.open("w"),
    )
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene

    s = load_scene(str(scene_file), native_bvh=True)
    assert s.bvh is not None and s.bvh.num_nodes >= 1
    assert s.bvh.tri_count.max() <= 4
