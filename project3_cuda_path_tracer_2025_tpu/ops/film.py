"""Film accumulation.

``finalGather`` (``src/pathtrace.cu:624-633``) adds EVERY path's final color
to its pixel, once per iteration -- including paths that terminated with 0
(miss) and paths that exhausted their bounces still carrying throughput.
The film lives on device as a Vec3 of [N] arrays and is only transferred to
host on save (the reference copies D2H every frame, ``src/pathtrace.cu:783``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.vec import Vec3
from .rays import PathState


def new_film(n: int) -> Vec3:
    return Vec3.zeros((n,))


def accumulate(
    film: Vec3, paths: PathState, permuted: bool = False, base=0
) -> Vec3:
    """film[pixel] += color.  When the wavefront integrator has permuted the
    path slots, scatter-add by pixel index; otherwise slots are in pixel
    order and it is a pure vector add.  ``base`` shifts global pixel ids to
    local film indices inside a shard_map block (pixel-parallel multi-chip:
    a chip's film covers pixels [base, base + local_n))."""
    if permuted:
        dst = paths.pixel if isinstance(base, int) and base == 0 else paths.pixel - base
        return Vec3(
            film.x.at[dst].add(paths.color.x),
            film.y.at[dst].add(paths.color.y),
            film.z.at[dst].add(paths.color.z),
        )
    return film + paths.color


def to_host_image(film: Vec3, width: int, height: int) -> np.ndarray:
    """[H, W, 3] float32 accumulator (still un-divided by iterations)."""
    arr = jnp.stack([film.x, film.y, film.z], axis=-1)
    return np.asarray(arr).reshape(height, width, 3)
