"""Wavefront state management: stream compaction + material sort.

The reference shrinks its live-path buffer with ``thrust::stable_partition``
(``src/pathtrace.cu:750-757``) and optionally groups work with
``thrust::stable_sort_by_key`` on material id (``:730-735``).  XLA needs
static shapes, so both become *permutations* of the full N-slot SoA state:

* ``compact_paths``: stable front-pack of live rays (prefix-sum ranks) +
  a live count.  Kernels still see N lanes, but trailing lanes are all-dead,
  which lets blocked/Pallas kernels early-out whole blocks, and the live
  count reproduces the reference's ``num_paths`` telemetry.
* ``sort_paths_by_material``: stable key sort with terminated rays keyed to a
  sentinel bucket past every real material.

Both are built on an exclusive scan; see ``ops.scan`` for the Pallas
implementation and the jnp oracle.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..utils import vec
from . import scan as scan_ops
from .rays import Intersections, PathState


def _apply_permutation(paths: PathState, perm: jnp.ndarray) -> PathState:
    return PathState(
        origin=vec.select_gather(paths.origin, perm),
        direction=vec.select_gather(paths.direction, perm),
        color=vec.select_gather(paths.color, perm),
        pixel=paths.pixel[perm],
        bounces=paths.bounces[perm],
    )


def _apply_permutation_isect(isect: Intersections, perm: jnp.ndarray) -> Intersections:
    return Intersections(
        t=isect.t[perm],
        normal=vec.select_gather(isect.normal, perm),
        material_id=isect.material_id[perm],
        uv_u=isect.uv_u[perm],
        uv_v=isect.uv_v[perm],
        dpdu=vec.select_gather(isect.dpdu, perm),
        dpdv=vec.select_gather(isect.dpdv, perm),
        is_triangle=isect.is_triangle[perm],
    )


def front_pack_permutation(alive: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable partition permutation: live lanes first (original order), dead
    lanes after (original order).  Returns (perm, live_count).

    Built on ``ops.scan.compact_indices`` -- the MXU triangular-matmul scan
    on TPU, the jnp oracle on CPU/small N (the same layering as the
    reference, where ``stream_compaction/`` is the scan library and
    ``thrust::stable_partition`` the consumer)."""
    n = alive.shape[0]
    dest, live_count = scan_ops.compact_indices(alive)
    perm = jnp.zeros((n,), jnp.int32).at[dest].set(jnp.arange(n, dtype=jnp.int32))
    return perm, live_count


def compact_paths(paths: PathState) -> Tuple[PathState, jnp.ndarray]:
    """thrust::stable_partition(PathAlive) equivalent (permutes, never
    drops -- finalGather still reads all N slots)."""
    perm, live = front_pack_permutation(paths.alive)
    return _apply_permutation(paths, perm), live


def sort_paths_by_material(
    paths: PathState, isect: Intersections, num_materials: int
) -> Tuple[PathState, Intersections]:
    """thrust::stable_sort_by_key(CompareMat) equivalent: stable sort of
    (intersections, paths) by material id.  Missed/terminated rays keep the
    reference's key semantics (CompareMat sorts raw materialId; misses were
    zeroed by the per-bounce memset, so their key is whatever the
    intersection holds -- here 0 for misses, matching the memset)."""
    key = isect.material_id
    order = jnp.argsort(key, stable=True)
    return _apply_permutation(paths, order), _apply_permutation_isect(isect, order)
