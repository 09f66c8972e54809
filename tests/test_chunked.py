"""Chunked dispatch (config.pixel_chunks): C sequential same-program
launches over pixel blocks == one launch (pixel-keyed RNG).  The
megakernel paths match bit-for-bit; the wavefront shard program fuses FMA
contraction differently than the full-frame program, so it matches to the
repo's standard 1e-6 fusion tolerance (same class as the fused-vs-unfused
and shard_map tests).
Exists to bound per-program ray count for the brute-force A/B at full
resolution (PARITY.md round-3: the axon worker faults on the single
640k-ray brute program)."""

import numpy as np
import pytest

from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
from project3_cuda_path_tracer_2025_tpu.models import Renderer
from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution


@pytest.mark.parametrize(
    "kw",
    [
        dict(bvh_acceleration=False),
        dict(integrator="wavefront"),
        dict(mesh_intersector="mxu", ray_sorting="on", fused_bounce="on"),
    ],
    ids=["brute", "wavefront", "fused-mesh-mxu"],
)
def test_pixel_chunks_bitexact(repo_root, kw):
    mesh = "mesh_intersector" in kw or not kw.get("bvh_acceleration", True)
    scene_path = (
        str(repo_root / "scenes" / "cornell_mesh_5k.json")
        if mesh
        else "/root/reference/scenes/cornell.json"
    )
    s = set_resolution(load_scene(scene_path), 16, 16)
    s.state.trace_depth = 2
    a = Renderer(s, RenderConfig(**kw))
    b = Renderer(s, RenderConfig(pixel_chunks=4, **kw))
    a.step()
    b.step()
    np.testing.assert_allclose(a.image(), b.image(), atol=1e-6, rtol=0)
    # step_many in chunked mode loops host-side; identity must survive it
    a.step_many(2)
    b.step_many(2)
    np.testing.assert_allclose(a.image(), b.image(), atol=1e-6, rtol=0)


def test_pixel_chunks_must_divide(repo_root):
    s = set_resolution(load_scene("/root/reference/scenes/cornell.json"), 10, 10)
    with pytest.raises(ValueError, match="divide"):
        Renderer(s, RenderConfig(pixel_chunks=3))


def test_pixel_chunks_auto_resolution():
    """0 = auto engages ONLY for the measured fault class: brute force on
    an accelerator at >= ~200k rays (VERDICT round-4 #7: the naive CLI
    brute-force run must complete at 800^2 without knowing the
    workaround)."""
    brute = RenderConfig(bvh_acceleration=False)
    # 800^2 brute force on TPU: smallest divisor bounding chunks <= 96k rays
    assert brute.resolved_pixel_chunks(800 * 800, backend="tpu") == 8
    # BVH path never auto-chunks
    assert RenderConfig().resolved_pixel_chunks(800 * 800, backend="tpu") == 1
    # CPU never auto-chunks (no axon worker to fault)
    assert brute.resolved_pixel_chunks(800 * 800, backend="cpu") == 1
    # below the fault class
    assert brute.resolved_pixel_chunks(160 * 160, backend="tpu") == 1
    # explicit values pass through untouched
    assert RenderConfig(pixel_chunks=4).resolved_pixel_chunks(640000) == 4
    assert RenderConfig(pixel_chunks=1, bvh_acceleration=False
                        ).resolved_pixel_chunks(640000, backend="tpu") == 1
