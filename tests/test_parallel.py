"""Multi-chip data parallelism over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_iteration_runs_and_matches(scenes_dir):
    import jax.numpy as jnp

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.parallel.mesh import dryrun
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution

    film, alive, mesh = dryrun(8, str(scenes_dir / "cornell.json"), 32, 32)
    assert mesh.shape == {"rays": 8}
    counts = np.asarray(alive)
    assert counts[0] > 0 and counts[-1] == 0

    # Sharded result == single-device result (same RNG streams).
    s = set_resolution(load_scene(str(scenes_dir / "cornell.json")), 32, 32)
    r = Renderer(s, RenderConfig())
    r.step()
    single = np.stack(
        [np.asarray(r.film.x), np.asarray(r.film.y), np.asarray(r.film.z)], -1
    )
    sharded = np.stack(
        [np.asarray(film.x), np.asarray(film.y), np.asarray(film.z)], -1
    )
    np.testing.assert_allclose(sharded, single, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_mesh_mxu_matches(repo_root):
    """Mesh scene through the Pallas MXU intersector under ray-axis sharding
    == single-device (bit-level, same RNG streams)."""
    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.parallel.mesh import dryrun
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution

    scene_path = str(repo_root / "scenes" / "cornell_mesh_5k.json")
    film, alive, mesh = dryrun(8, scene_path, 16, 16, mesh_intersector="mxu")
    assert np.asarray(alive)[0] > 0

    s = set_resolution(load_scene(scene_path), 16, 16)
    r = Renderer(s, RenderConfig(mesh_intersector="mxu"))
    r.step()
    single = np.stack(
        [np.asarray(r.film.x), np.asarray(r.film.y), np.asarray(r.film.z)], -1
    )
    sharded = np.stack(
        [np.asarray(film.x), np.asarray(film.y), np.asarray(film.z)], -1
    )
    np.testing.assert_allclose(sharded, single, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_wavefront_matches(scenes_dir):
    """Wavefront integrator (compaction permutations + scatter-add film)
    under sharding == single-device wavefront."""
    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.parallel.mesh import dryrun
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution

    film, alive, mesh = dryrun(
        8, str(scenes_dir / "cornell.json"), 16, 16, integrator="wavefront"
    )
    s = set_resolution(load_scene(str(scenes_dir / "cornell.json")), 16, 16)
    r = Renderer(s, RenderConfig(integrator="wavefront"))
    r.step()
    single = np.stack(
        [np.asarray(r.film.x), np.asarray(r.film.y), np.asarray(r.film.z)], -1
    )
    sharded = np.stack(
        [np.asarray(film.x), np.asarray(film.y), np.asarray(film.z)], -1
    )
    np.testing.assert_allclose(sharded, single, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_film_is_actually_sharded(scenes_dir):
    from project3_cuda_path_tracer_2025_tpu.parallel.mesh import dryrun

    film, _, mesh = dryrun(8, str(scenes_dir / "cornell.json"), 32, 32)
    sharding = film.x.sharding
    # one distinct shard per device along the ray axis
    assert len(sharding.device_set) == 8
