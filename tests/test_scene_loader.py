"""Scene-layer tests: JSON loader, transforms, camera derivation, OBJ import.

The reference has no tests; its de-facto fixtures are the 25 scenes/*.json
files (SURVEY.md section 4).  All JSON-only scenes must load unmodified; the
cornell_obj_* scenes reference .obj assets stripped from the mirror and are
expected to fail with FileNotFoundError.
"""

import json
import math
import os

import numpy as np
import pytest

from project3_cuda_path_tracer_2025_tpu.scene import load_scene
from project3_cuda_path_tracer_2025_tpu.scene.camera import (
    OrbitState,
    derive_render_camera,
)
from project3_cuda_path_tracer_2025_tpu.scene.device import build_device_scene
from project3_cuda_path_tracer_2025_tpu.scene.types import GeomType
from project3_cuda_path_tracer_2025_tpu.utils import mathutil


def _scene_files(scenes_dir):
    return sorted(p for p in scenes_dir.glob("*.json"))


def _missing_assets(scenes_dir, path):
    data = json.loads(path.read_text())
    for obj in data.get("Objects", []):
        if obj.get("TYPE") == "obj":
            if not (scenes_dir / obj["PATH"]).exists():
                return True
    return False


def test_all_reference_scenes_parse(scenes_dir):
    """Every shipped scene either loads or fails only because its large
    binary asset was stripped from the mirror."""
    n_loaded = 0
    for path in _scene_files(scenes_dir):
        if _missing_assets(scenes_dir, path):
            with pytest.raises(FileNotFoundError):
                load_scene(str(path))
        else:
            scene = load_scene(str(path))
            assert scene.state.camera.resolution[0] > 0
            assert len(scene.materials) > 0
            n_loaded += 1
    assert n_loaded >= 5  # cornell + material test scenes at minimum


def test_cornell_scene_contents(scenes_dir):
    scene = load_scene(str(scenes_dir / "cornell.json"))
    assert len(scene.materials) == 5
    assert len(scene.geoms) == 7
    assert scene.num_triangles == 0
    assert scene.state.iterations == 5000
    assert scene.state.trace_depth == 8
    assert scene.state.image_name == "cornell"
    cam = scene.state.camera
    assert tuple(cam.resolution) == (800, 800)
    assert cam.aperture == pytest.approx(0.02)
    assert cam.focal_dist == pytest.approx(10.5)
    # fovy=45 acts as HALF angle in the reference (src/scene.cpp:204)
    assert cam.pixel_length[1] == pytest.approx(2.0 * math.tan(math.radians(45)) / 800)

    light = scene.materials[scene.material_name_to_id["light"]]
    assert light.emittance == pytest.approx(5.0)
    # "specular_white" has ROUGHNESS but TYPE Diffuse -> stays diffuse
    spec = scene.materials[scene.material_name_to_id["specular_white"]]
    assert spec.roughness == -1.0 and spec.has_reflective == 0.0

    # last object is the sphere
    sph = scene.geoms[-1]
    assert sph.type == GeomType.SPHERE
    np.testing.assert_allclose(sph.translation, [-1.0, 4.0, -1.0])


def test_material_types(scenes_dir):
    scene = load_scene(str(scenes_dir / "cornell_glass_test.json"))
    glass = [m for m in scene.materials if m.has_reflective and m.has_refractive]
    assert glass and glass[0].index_of_refraction > 1.0

    scene = load_scene(str(scenes_dir / "cornell_microfacet_test.json"))
    micro = [m for m in scene.materials if m.roughness >= 0 and m.metallic >= 0]
    assert micro


def test_sphere_scene_missing_aperture_warns(scenes_dir):
    with pytest.warns(UserWarning, match="APERTURE"):
        scene = load_scene(str(scenes_dir / "sphere.json"))
    assert scene.state.camera.aperture == 0.0


def test_build_transformation_matrix_parity():
    """T * Rx * Ry * Rz * S, degrees (src/utilities.cpp:85-93)."""
    m = mathutil.build_transformation_matrix([1, 2, 3], [30, 45, 60], [2, 2, 2])
    # A point at origin maps to the translation
    np.testing.assert_allclose(m @ [0, 0, 0, 1], [1, 2, 3, 1], atol=1e-12)
    # Rotation order: X then Y then Z applied right-to-left on the vector
    rx = mathutil.rotate_axis(math.radians(30), (1, 0, 0))
    ry = mathutil.rotate_axis(math.radians(45), (0, 1, 0))
    rz = mathutil.rotate_axis(math.radians(60), (0, 0, 1))
    expect = mathutil.translate([1, 2, 3]) @ rx @ ry @ rz @ mathutil.scale([2, 2, 2])
    np.testing.assert_allclose(m, expect, atol=1e-12)


def test_rotation_is_degrees_xyz_order():
    m = mathutil.build_transformation_matrix([0, 0, 0], [0, 0, 90], [1, 1, 1])
    # Rz(90): x-axis -> y-axis
    np.testing.assert_allclose(m @ [1, 0, 0, 1], [0, 1, 0, 1], atol=1e-12)


def test_render_camera_reconstruction_cornell(scenes_dir):
    """For cornell.json's axis-aligned view, the spherical reconstruction
    reproduces EYE exactly (src/main.cpp:423-444)."""
    scene = load_scene(str(scenes_dir / "cornell.json"))
    cam = derive_render_camera(scene.state.camera)
    np.testing.assert_allclose(cam.position, [0.0, 5.0, 10.5], atol=1e-6)
    np.testing.assert_allclose(cam.view, [0.0, 0.0, -1.0], atol=1e-7)
    np.testing.assert_allclose(cam.up, [0.0, 1.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(cam.right, [1.0, 0.0, 0.0], atol=1e-7)
    assert cam.focal_dist == pytest.approx(10.5)


def test_orbit_state_roundtrip(scenes_dir):
    scene = load_scene(str(scenes_dir / "cornell.json"))
    orbit = OrbitState.from_camera(scene.state.camera)
    assert orbit.zoom == pytest.approx(10.5)
    orbit.orbit(dzoom=-0.5)
    cam = derive_render_camera(scene.state.camera, orbit)
    assert cam.focal_dist == pytest.approx(10.0)


def test_device_scene_build(scenes_dir):
    scene = load_scene(str(scenes_dir / "cornell.json"))
    dev, static = build_device_scene(scene)
    assert static.pixel_count == 800 * 800
    assert len(static.geoms) == 7
    assert not static.has_triangles
    assert dev.materials.emittance.shape == (5,)
    # static geoms hash (usable as jit static argument)
    hash(static)


def test_obj_loader_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    from project3_cuda_path_tracer_2025_tpu.scene.obj_loader import load_obj_triangles

    tris = load_obj_triangles(
        str(obj), 3, np.eye(4), np.eye(4)
    )
    assert tris["tri_positions"].shape == (2, 3, 3)
    # no vn records -> flat face normal +z
    np.testing.assert_allclose(tris["tri_normals"][0], [[0, 0, 1]] * 3, atol=1e-6)
    assert (tris["tri_material_ids"] == 3).all()
    # fan: (v0, v1, v2) then (v0, v2, v3)
    np.testing.assert_allclose(tris["tri_positions"][1][0], [0, 0, 0])
    np.testing.assert_allclose(tris["tri_positions"][1][1], [1, 1, 0])
    np.testing.assert_allclose(tris["tri_positions"][1][2], [0, 1, 0])


def test_obj_world_space_baking(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n")
    from project3_cuda_path_tracer_2025_tpu.scene.obj_loader import load_obj_triangles

    xform = mathutil.build_transformation_matrix([5, 0, 0], [0, 0, 0], [2, 2, 2])
    tris = load_obj_triangles(str(obj), 0, xform, mathutil.inverse_transpose(xform))
    np.testing.assert_allclose(tris["tri_positions"][0][0], [7, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        tris["tri_centroids"][0], [5 + 2 / 3, 2 / 3, 2 / 3], atol=1e-5
    )


def test_obj_fast_path_matches_general(tmp_path, repo_root):
    """The vectorized uniform-triangle parser must equal the general
    per-line parser bit-for-bit, across every index layout; non-uniform
    files must decline to the general path."""
    from project3_cuda_path_tracer_2025_tpu.scene import obj_loader as O

    xform = mathutil.build_transformation_matrix([1, 2, 0], [0, 30, 0], [2, 2, 2])
    it = mathutil.inverse_transpose(xform)

    # Shipped asset (v//n layout, 5k tris) + synthetic layouts.
    cases = [str(repo_root / "scenes" / "obj" / "ico4.obj")]
    layouts = {
        "plain.obj": "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 1\nf 1 2 3\nf 2 3 4\n",
        "vt.obj": (
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
            "f 1/1 2/2 3/3\n"
        ),
        "vtn.obj": (
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
            "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
            "f 1/1/1 2/2/2 3/3/3\n"
        ),
        "vn.obj": (
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
            "f 1//1 2//2 3//3\n"
        ),
        "negative.obj": "v 0 0 0\nv 1 0 0\nv 1 1 0\nf -3 -2 -1\n",
        "comments.obj": (
            "# header\no thing\ng grp\ns off\nusemtl none\n"
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nf 1 2 3\n"
        ),
        # POSITIVE indices interleaved with faces stay on the fast path
        # (absolute indices are order-independent).
        "interleaved_pos.obj": (
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nf 1 2 3\n"
            "v 2 0 0\nv 3 0 0\nv 3 1 0\nf 4 5 6\n"
        ),
    }
    for name, text in layouts.items():
        p = tmp_path / name
        p.write_text(text)
        cases.append(str(p))
    for path in cases:
        assert O._parse_obj_uniform(path) is not None, path
        a = O.load_obj_triangles(path, 2, xform, it)
        b = O._load_obj_triangles_general(path, 2, xform, it)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{path}:{k}")

    # Non-uniform files decline (general path answers; its own tests cover
    # the semantics): polygons, mixed layouts, extra components, unknown tags.
    declines = {
        "quad.obj": "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n",
        "mixed.obj": (
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
            "f 1/1 2/2 3/3\nf 1 2 3\n"
        ),
        "wcoord.obj": "v 0 0 0 1\nv 1 0 0 1\nv 1 1 0 1\nf 1 2 3\n",
        "curve.obj": "v 0 0 0\nv 1 0 0\nv 1 1 0\nf 1 2 3\ncurv 0 1 1 2\n",
        # NEGATIVE indices resolve against the RUNNING vertex count at the
        # face's position (OBJ spec / general parser); the vectorized
        # resolve uses the final count, so interleaved+negative must
        # decline -- accepting it would bind the first face to the LAST
        # three vertices.
        "interleaved_neg.obj": (
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nf -3 -2 -1\n"
            "v 2 0 0\nv 3 0 0\nv 3 1 0\nf -3 -2 -1\n"
        ),
    }
    for name, text in declines.items():
        p = tmp_path / name
        p.write_text(text)
        assert O._parse_obj_uniform(str(p)) is None, name

    # And the general parser must give the interleaved-negative file its
    # spec semantics: the FIRST face binds to the FIRST three vertices.
    got = O.load_obj_triangles(
        str(tmp_path / "interleaved_neg.obj"), 2, np.eye(4), np.eye(4)
    )
    np.testing.assert_allclose(
        got["tri_positions"][0],
        np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32),
    )
    np.testing.assert_allclose(
        got["tri_positions"][1],
        np.array([[2, 0, 0], [3, 0, 0], [3, 1, 0]], np.float32),
    )


def test_multi_obj_scene(tmp_path):
    """Two obj objects with different materials and transforms concatenate
    into one triangle set (reference appends to global arrays,
    src/scene.cpp:226-363)."""
    import json

    (tmp_path / "a.obj").write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nf 1 2 3\n")
    (tmp_path / "b.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    scene = {
        "Materials": {
            "light": {"TYPE": "Emitting", "RGB": [1, 1, 1], "EMITTANCE": 5.0},
            "m0": {"TYPE": "Diffuse", "RGB": [0.9, 0.1, 0.1]},
            "m1": {"TYPE": "Diffuse", "RGB": [0.1, 0.9, 0.1]},
        },
        "Camera": {
            "RES": [8, 8], "FOVY": 45.0, "ITERATIONS": 1, "DEPTH": 3,
            "FILE": "multi", "EYE": [0, 0, 4], "LOOKAT": [0, 0, 0],
            "UP": [0, 1, 0], "APERTURE": 0.0,
        },
        "Objects": [
            {"TYPE": "cube", "MATERIAL": "light",
             "TRANS": [0, 3, 0], "ROTAT": [0, 0, 0], "SCALE": [2, 0.2, 2]},
            {"TYPE": "obj", "PATH": "a.obj", "MATERIAL": "m0",
             "TRANS": [-1, 0, 0], "ROTAT": [0, 0, 0], "SCALE": [1, 1, 1]},
            {"TYPE": "obj", "PATH": "b.obj", "MATERIAL": "m1",
             "TRANS": [1, 0, 0], "ROTAT": [0, 45, 0], "SCALE": [1, 1, 1]},
        ],
    }
    p = tmp_path / "multi.json"
    p.write_text(json.dumps(scene))
    s = load_scene(str(p))
    assert s.tri_positions.shape[0] == 3  # 1 tri + fan-split quad (2)
    np.testing.assert_array_equal(s.tri_material_ids, [1, 2, 2])
    # world bake applied per object: first tri shifted -1 in x
    assert s.tri_positions[0, :, 0].max() <= 0.0 + 1e-6
    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer

    r = Renderer(s, RenderConfig())
    r.step()
    assert np.isfinite(r.image()).all()
