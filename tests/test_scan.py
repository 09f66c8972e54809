"""Scan / compact / radix library vs jnp oracles (reference's
stream_compaction test strategy, SURVEY.md C17).

On the CPU test backend the Pallas path falls back to jnp; the Pallas kernel
itself is additionally exercised in interpret mode here, and on real TPU by
bench/test scripts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from project3_cuda_path_tracer_2025_tpu.ops import scan as scan_mod


def test_exclusive_scan_matches_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 5, 1000), jnp.int32)
    out = scan_mod.exclusive_scan(x)
    expect = np.cumsum(np.asarray(x)) - np.asarray(x)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_pallas_scan_interpret_mode():
    """Run the actual Pallas tile kernel under the interpreter."""
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(1)
    x = rng.random((scan_mod.SUBLANES, scan_mod.LANES)).astype(np.float32)

    lane, tot = pl.pallas_call(
        scan_mod._scan_tile_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        interpret=True,
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(lane), np.cumsum(x, axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tot)[:, 0], x.sum(axis=1), rtol=1e-5)


def test_pallas_scan_full_path_interpret(monkeypatch):
    """Exercise the tiled + carry logic end to end (forced past the CPU
    fallback) in interpret mode."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)

    n = scan_mod.TILE * 2 + 777  # force padding + multiple tiles
    rng = np.random.default_rng(2)
    x = rng.integers(0, 3, n).astype(np.float32)
    out = scan_mod._scan_pallas_f32(jnp.asarray(x), inclusive=False)
    np.testing.assert_allclose(np.asarray(out), np.cumsum(x) - x, rtol=1e-5)
    out_i = scan_mod._scan_pallas_f32(jnp.asarray(x), inclusive=True)
    np.testing.assert_allclose(np.asarray(out_i), np.cumsum(x), rtol=1e-5)


def test_compact_matches_oracle():
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.integers(0, 100, 500), jnp.int32)
    flags = jnp.asarray(rng.random(500) > 0.6)
    packed, count = scan_mod.compact(vals, flags)
    v = np.asarray(vals)
    f = np.asarray(flags)
    assert int(count) == f.sum()
    np.testing.assert_array_equal(np.asarray(packed)[: f.sum()], v[f])
    # rejected tail is stable too
    np.testing.assert_array_equal(np.asarray(packed)[f.sum():], v[~f])


def test_radix_sort_stable():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 37, 400).astype(np.int32)
    perm = scan_mod.radix_sort_permutation(jnp.asarray(keys), num_bits=6)
    perm = np.asarray(perm)
    sorted_keys = keys[perm]
    assert (np.diff(sorted_keys) >= 0).all()
    # stability: equal keys keep original relative order
    for k in np.unique(keys):
        np.testing.assert_array_equal(
            perm[sorted_keys == k], np.sort(perm[sorted_keys == k])
        )


def test_radix_sort_full_width():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**31 - 1, 256).astype(np.int32)
    perm = np.asarray(scan_mod.radix_sort_permutation(jnp.asarray(keys), num_bits=31))
    np.testing.assert_array_equal(keys[perm], np.sort(keys, kind="stable"))


def test_naive_scan_matches_oracle():
    """Hillis-Steele flavor (reference stream_compaction/naive.cu:17-74)."""
    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 128, 1000, 4097):
        x = jnp.asarray(rng.integers(0, 5, n), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(scan_mod.inclusive_scan_naive(x)),
            np.cumsum(np.asarray(x)),
        )
        np.testing.assert_array_equal(
            np.asarray(scan_mod.exclusive_scan_naive(x)),
            np.cumsum(np.asarray(x)) - np.asarray(x),
        )
