"""Counter-based RNG invariants.

The permutation-invariance of every integrator/toggle combination rests on
``uniforms_at`` being BIT-identical to drawing in pixel order and gathering
(``uniforms(key, n, k)[:, idx]``).  It reconstructs jax.random's
partitionable-threefry bits at explicit flat counters, so these tests also
act as a tripwire if a jax upgrade changes the counter layout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from project3_cuda_path_tracer_2025_tpu.utils import prng


def test_uniforms_at_identity_order():
    key = prng.stage_key(prng.iteration_key(jax.random.PRNGKey(3), 7), 2, 1)
    n, k = 1024, 3
    ref = prng.uniforms(key, n, k)
    got = prng.uniforms_at(key, jnp.arange(n, dtype=jnp.int32), k, n)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_uniforms_at_matches_gather_under_permutation():
    key = jax.random.PRNGKey(11)
    n, k = 640, 4
    idx = jax.random.permutation(jax.random.PRNGKey(5), n)
    ref = prng.uniforms(key, n, k)[:, idx]
    got = prng.uniforms_at(key, idx, k, n)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_uniforms_at_repeated_indices():
    """Compacted wavefronts can hold duplicate pixel ids in dead slots."""
    key = jax.random.PRNGKey(0)
    n = 256
    idx = jnp.zeros((n,), jnp.int32).at[: n // 2].set(jnp.arange(n // 2))
    ref = prng.uniforms(key, n, 2)[:, idx]
    got = prng.uniforms_at(key, idx, 2, n)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_threefry_inline_matches_primitive():
    """``threefry_bits_inline`` (the Pallas-compatible spelled-out hash the
    fused shade kernel draws with) must reproduce jax's threefry2x32
    primitive bit-for-bit at the same (key, counter) -- this is what makes
    the in-kernel RNG draw invisible to every cross-integrator
    bit-identity test."""
    import numpy as np

    key = jax.random.key(20260819)
    kd = jax.random.key_data(key)
    flat = jnp.asarray(
        np.random.default_rng(3).integers(0, 2**31, 4096), jnp.uint32
    )
    ref = prng._threefry_bits_at(key, flat)
    inl = prng.threefry_bits_inline(kd[0], kd[1], flat)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(inl))

    n = 9999
    idx = jnp.asarray(
        np.random.default_rng(4).integers(0, n, 2048), jnp.int32
    )
    ref_u = prng.uniforms_at(key, idx, 3, n)
    inl_u = jnp.stack([
        prng.bits_to_uniform(
            prng.threefry_bits_inline(
                kd[0], kd[1], jnp.uint32(j * n) + idx.astype(jnp.uint32)
            )
        )
        for j in range(3)
    ])
    np.testing.assert_array_equal(np.asarray(ref_u), np.asarray(inl_u))
