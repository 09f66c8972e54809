"""Pallas traversal kernel vs the jnp threaded traversal (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
from project3_cuda_path_tracer_2025_tpu.ops.intersect import mesh_intersect_bvh
from project3_cuda_path_tracer_2025_tpu.ops.intersect_pallas import (
    mesh_intersect_pallas,
)
from project3_cuda_path_tracer_2025_tpu.scene.device import build_device_scene
from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3

from tests.test_intersect import _random_mesh_scene

CFG = RenderConfig()


def test_pallas_traversal_matches_jnp():
    rng = np.random.default_rng(42)
    scene = _random_mesh_scene(rng, n_tris=200)
    dev, static = build_device_scene(scene)
    assert static.pallas_lanes > 0

    n_rays = 333  # deliberately not a multiple of the block size
    origins = rng.normal(size=(n_rays, 3))
    origins = 3.0 * origins / np.linalg.norm(origins, axis=1, keepdims=True)
    dirs = rng.uniform(-0.8, 0.8, (n_rays, 3)) - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ro = Vec3(*[jnp.asarray(origins[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(dirs[:, i], jnp.float32) for i in range(3)])
    active = jnp.asarray(rng.random(n_rays) > 0.1)
    lim = jnp.full((n_rays,), 3.4e38, jnp.float32)

    ref = mesh_intersect_bvh(dev, static, ro, rd, active, lim, CFG.baby_epsilon)
    out = mesh_intersect_pallas(
        dev.pallas_mesh,
        static.pallas_lanes,
        static.num_nodes,
        static.num_triangles,
        static.leaf_size,
        ro,
        rd,
        active,
        lim,
        CFG.baby_epsilon,
        interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(out.tri), np.asarray(ref.tri))
    hit = np.asarray(ref.tri) >= 0
    assert hit.sum() > 30
    np.testing.assert_allclose(
        np.asarray(out.t)[hit], np.asarray(ref.t)[hit], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.u)[hit], np.asarray(ref.u)[hit], rtol=1e-5, atol=1e-6
    )
    # inactive rays report no hit
    inact = ~np.asarray(active)
    assert (np.asarray(out.tri)[inact] == -1).all()


def test_pallas_render_matches_jnp_render(scenes_dir, tmp_path):
    """Full iteration image equality with use_pallas on/off (tiny mesh)."""
    import json

    obj = tmp_path / "octa.obj"
    obj.write_text(
        "v 1 0 0\nv -1 0 0\nv 0 1 0\nv 0 -1 0\nv 0 0 1\nv 0 0 -1\n"
        "f 1 3 5\nf 3 2 5\nf 2 4 5\nf 4 1 5\n"
        "f 3 1 6\nf 2 3 6\nf 4 2 6\nf 1 4 6\n"
    )
    scene_file = tmp_path / "s.json"
    json.dump(
        {
            "Materials": {
                "light": {"TYPE": "Emitting", "RGB": [1, 1, 1], "EMITTANCE": 5.0},
                "w": {"TYPE": "Diffuse", "RGB": [0.8, 0.8, 0.8]},
            },
            "Camera": {
                "RES": [24, 24], "FOVY": 30.0, "ITERATIONS": 2, "DEPTH": 4,
                "FILE": "o", "EYE": [0, 0, 5], "LOOKAT": [0, 0, 0],
                "UP": [0, 1, 0], "APERTURE": 0.0,
            },
            "Objects": [
                {"TYPE": "obj", "PATH": "octa.obj", "MATERIAL": "w",
                 "TRANS": [0, 0, 0], "ROTAT": [10, 20, 30], "SCALE": [1, 1, 1]},
                {"TYPE": "cube", "MATERIAL": "light",
                 "TRANS": [0, 3, 0], "ROTAT": [0, 0, 0], "SCALE": [2, 0.2, 2]},
            ],
        },
        scene_file.open("w"),
    )
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene

    scene = load_scene(str(scene_file))

    def film(use_pallas):
        r = Renderer(scene, RenderConfig(use_pallas=use_pallas))
        for _ in range(2):
            r.step()
        return r.image()

    a = film(False)
    b = film(True)
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert a.mean() > 0.001
