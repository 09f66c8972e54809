"""Texture sampling: bilinear, wrap addressing, normalized coords.

Parity with the reference's CUDA texture objects (``src/pathtrace.cu:110-131``:
``cudaFilterModeLinear`` + ``cudaAddressModeWrap`` + normalized float reads)
and its samplers (``sampleTexture``/``sampleHeight``, ``:505-519``):

* albedo/height lookups flip v: ``tex2D(u, 1 - v)``;
* out-of-range texture ids return magenta (1, 0, 1) / height 0;
* bump height is the ``.x`` (red) channel.

CUDA's linear filter samples at (u*W - 0.5, v*H - 0.5) texel space; the same
convention is used here with full float weights (CUDA quantizes the fraction
to 9 bits -- a <0.2% difference well under the RMSE gate).

Implemented as flat gathers from the padded per-channel texture stack.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.device import TextureTable
from ..utils.vec import Vec3


def _bilinear(
    channel: jnp.ndarray,  # flat [NT * Hmax * Wmax]
    tex_id: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    tw: jnp.ndarray,  # per-lane true width
    th: jnp.ndarray,
    wmax: int,
    hmax: int,
) -> jnp.ndarray:
    x = u * tw.astype(jnp.float32) - 0.5
    y = v * th.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def wrap(i, n):
        return jnp.mod(i, n)

    x0w = wrap(x0i, tw)
    x1w = wrap(x0i + 1, tw)
    y0w = wrap(y0i, th)
    y1w = wrap(y0i + 1, th)

    base = tex_id * (wmax * hmax)

    def at(yy, xx):
        return channel[base + yy * wmax + xx]

    c00 = at(y0w, x0w)
    c01 = at(y0w, x1w)
    c10 = at(y1w, x0w)
    c11 = at(y1w, x1w)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_texture(
    tex: TextureTable,
    num_textures: int,
    wmax: int,
    hmax: int,
    tex_id: jnp.ndarray,  # i32 per lane (may be out of range)
    uv_u: jnp.ndarray,
    uv_v: jnp.ndarray,
) -> Vec3:
    """RGB sample at (u, 1-v); magenta fallback for invalid ids
    (``sampleTexture``, ``src/pathtrace.cu:505-512``)."""
    valid = (tex_id >= 0) & (tex_id < num_textures)
    tid = jnp.clip(tex_id, 0, max(num_textures - 1, 0))
    tw = tex.width[tid]
    th = tex.height[tid]
    u = uv_u
    v = 1.0 - uv_v
    r = _bilinear(tex.r, tid, u, v, tw, th, wmax, hmax)
    g = _bilinear(tex.g, tid, u, v, tw, th, wmax, hmax)
    b = _bilinear(tex.b, tid, u, v, tw, th, wmax, hmax)
    return Vec3(
        jnp.where(valid, r, 1.0),
        jnp.where(valid, g, 0.0),
        jnp.where(valid, b, 1.0),
    )


def sample_height(
    tex: TextureTable,
    num_textures: int,
    wmax: int,
    hmax: int,
    tex_id: jnp.ndarray,
    uv_u: jnp.ndarray,
    uv_v: jnp.ndarray,
) -> jnp.ndarray:
    """Height = red channel at (u, 1-v); 0 for invalid ids
    (``sampleHeight``, ``src/pathtrace.cu:515-519``)."""
    valid = (tex_id >= 0) & (tex_id < num_textures)
    tid = jnp.clip(tex_id, 0, max(num_textures - 1, 0))
    tw = tex.width[tid]
    th = tex.height[tid]
    h = _bilinear(tex.r, tid, uv_u, 1.0 - uv_v, tw, th, wmax, hmax)
    return jnp.where(valid, h, 0.0)
