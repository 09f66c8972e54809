"""Camera ray generation: stochastic-AA jitter + thin-lens depth of field.

Parity with ``generateRayFromCamera`` (``src/pathtrace.cu:247-292``) and
``sampleAperture`` (``:231-237``), including the reference quirk that the
aperture offset is applied in *world* axes (x, y, 0), not the lens plane.

One fused vectorized op over all N = W*H pixels; XLA fuses it with the first
bounce's intersection kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.camera import CameraState
from ..utils import vec
from ..utils.mathutil import TWO_PI
from ..utils.vec import Vec3
from .rays import PathState


def generate_camera_rays(
    cam: CameraState,
    width: int,
    height: int,
    trace_depth: int,
    uniforms: jnp.ndarray,  # [4, N] U[0,1)
    idx: jnp.ndarray | None = None,  # global pixel ids (default: all W*H)
) -> PathState:
    """``idx`` selects which pixels to generate rays for -- the full frame
    by default, or one chip's contiguous block under ``shard_map``
    (``parallel.shardmap``); the math is position-independent so a sharded
    raygen is bit-identical to the corresponding slice of the full one."""
    if idx is None:
        idx = jnp.arange(width * height, dtype=jnp.int32)
    n = idx.shape[0]
    x = (idx % width).astype(jnp.float32)
    y = (idx // width).astype(jnp.float32)

    jitter_x = uniforms[0]
    jitter_y = uniforms[1]

    view = Vec3(cam.view[0], cam.view[1], cam.view[2])
    right = Vec3(cam.right[0], cam.right[1], cam.right[2])
    up = Vec3(cam.up[0], cam.up[1], cam.up[2])
    position = Vec3(cam.position[0], cam.position[1], cam.position[2])

    sx = cam.pixel_length[0] * (x + jitter_x - width * 0.5)
    sy = cam.pixel_length[1] * (y + jitter_y - height * 0.5)
    pixel_point = view - right * sx - up * sy
    ray_dir = vec.normalize(pixel_point)

    focal_point = position + ray_dir * cam.focal_dist

    # Thin-lens aperture sample: uniform disk via sqrt(r), offset applied in
    # world x/y (reference quirk, src/pathtrace.cu:231-237,282-285).
    r = cam.aperture * jnp.sqrt(uniforms[2])
    theta = TWO_PI * uniforms[3]
    zero = jnp.zeros_like(r * theta)
    aperture_offset = Vec3(r * jnp.cos(theta), r * jnp.sin(theta), zero)

    origin = position + aperture_offset
    direction = vec.normalize(focal_point - origin)

    one = jnp.ones((n,), jnp.float32)
    return PathState(
        origin=Vec3(
            jnp.broadcast_to(origin.x, (n,)),
            jnp.broadcast_to(origin.y, (n,)),
            jnp.broadcast_to(origin.z, (n,)),
        ),
        direction=direction,
        color=Vec3(one, one, one),
        pixel=idx,
        bounces=jnp.full((n,), trace_depth, jnp.int32),
    )
