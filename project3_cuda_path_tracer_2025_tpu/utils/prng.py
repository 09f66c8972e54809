"""Counter-based RNG for path tracing.

The reference seeds a minstd LCG per (iteration, pixel, depth) via
``makeSeededRandomEngine`` (``src/pathtrace.cu:51-56``).  On TPU we use JAX's
counter-based threefry: a base key folded with (iteration, depth, stage)
produces a key whose per-lane draws are implicitly indexed by pixel, giving an
independent, reproducible stream per (iter, pixel, depth) with equivalent
statistics (bit-identity with the CUDA LCG is neither possible nor required --
acceptance is statistical RMSE at high spp, see BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iteration_key(base_key: jax.Array, iteration: jax.Array) -> jax.Array:
    """Key for one full spp iteration."""
    return jax.random.fold_in(base_key, iteration)


def stage_key(iter_key: jax.Array, depth, stage: int) -> jax.Array:
    """Key for one kernel stage at one bounce depth.

    ``stage`` disambiguates multiple consumers at the same depth
    (0 = camera raygen, 1 = shading).
    """
    return jax.random.fold_in(jax.random.fold_in(iter_key, depth), stage)


def uniforms(key: jax.Array, n: int, k: int) -> jax.Array:
    """Draw ``k`` independent U[0,1) arrays of shape [n] -> returns [k, n].

    [k, n] rather than [n, k] so each draw is a contiguous lanes-major row.
    """
    return jax.random.uniform(key, (k, n), dtype=jnp.float32)
