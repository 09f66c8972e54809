"""Microbench: the permutation-infrastructure primitives on real TPU.

Round-4: the 5k fused mesh bounce and the wavefront pack are both
bottlenecked by permutation plumbing (argsort ~8.7 ms + packed [N,12] row
gather ~9.5 ms at 640k rays), not kernels.  This measures the design space:

  * packed row gather [N, W] for W in {8, 12, 16, 24, 32}, f32 and i32
  * row SCATTER [N, W] (apply-by-destination, saves the perm inversion)
  * argsort(int32 key) vs cumsum-rank partition (+ the [N] invert scatter)
  * take_along_axis vs plain [perm] indexing

    python scripts/bench_permute_prims.py [--n 640000] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=640_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.utils.timers import device_sync

    n = args.n
    rng = np.random.default_rng(0)
    perm_np = rng.permutation(n).astype(np.int32)
    perm = jnp.asarray(perm_np)
    key = jnp.asarray(rng.integers(0, 1 << 15, n, dtype=np.int32))
    alive = jnp.asarray(rng.random(n) < 0.3)
    print(f"n={n}, backend={jax.default_backend()}", flush=True)

    def timed(name, fn, *xs):
        def chain(p):
            x = p
            for _ in range(args.k):
                out = fn(x, *xs)
                x = p + jnp.ravel(out)[0].astype(jnp.int32) * 0
            return x

        f = jax.jit(chain)
        out = f(perm)
        device_sync(out)
        t0 = time.perf_counter()
        out = f(perm)
        device_sync(out)
        ms = (time.perf_counter() - t0) * 1e3 / args.k
        print(f"{name:42s} {ms:8.2f} ms", flush=True)
        return ms

    for w in (8, 12, 16, 24, 32):
        m_f = jnp.asarray(rng.random((n, w)), jnp.float32)
        m_i = jnp.asarray(rng.integers(0, 1 << 20, (n, w), dtype=np.int32))
        timed(f"row gather f32 [n,{w}]  m[perm]", lambda p, m=m_f: m[p])
        timed(f"row gather i32 [n,{w}]  m[perm]", lambda p, m=m_i: m[p])
        timed(
            f"row scatter f32 [n,{w}] at[p].set",
            lambda p, m=m_f: jnp.zeros_like(m).at[p].set(m),
        )

    # column-major variant: W separate [n] gathers fused by XLA
    m_f = jnp.asarray(rng.random((n, 12)), jnp.float32)
    cols = [m_f[:, i] for i in range(12)]
    timed("12 separate [n] f32 gathers", lambda p: sum(c[p] for c in cols))

    timed("argsort(i32 key)", lambda p: jnp.argsort(key + p * 0))
    timed("argsort stable (i32)", lambda p: jnp.argsort(key + p * 0, stable=True))
    timed("sort pair (key, iota)", lambda p: jax.lax.sort(
        (key + p * 0, jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1])

    def partition_rank(p):
        a = alive | (p[0] < -1)
        c = jnp.cumsum(a.astype(jnp.int32))
        live = c[-1]
        dest = jnp.where(a, c - 1, live + jnp.cumsum((~a).astype(jnp.int32)) - 1)
        return dest

    timed("1-bit partition dest (2 cumsums)", partition_rank)
    timed(
        "partition dest + invert scatter",
        lambda p: jnp.zeros((n,), jnp.int32).at[partition_rank(p)].set(
            jnp.arange(n, dtype=jnp.int32)
        ),
    )
    timed("[n] int scatter alone", lambda p: jnp.zeros((n,), jnp.int32).at[p].set(
        jnp.arange(n, dtype=jnp.int32)))

    # small-keyspace rank: K=64 counting-sort dest via one-hot cumsum blocks
    def counting_dest(p, K=64):
        k6 = (key + p * 0) & (K - 1)
        oh = jax.nn.one_hot(k6, K, dtype=jnp.int32)  # [n, K]
        run = jnp.cumsum(oh, axis=0)  # rank within key, inclusive
        tot = run[-1]  # [K]
        base = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(tot)[:-1]])
        dest = (base[None, :] + run - 1)
        return jnp.sum(dest * oh, axis=1)

    timed("counting dest K=64 (cumsum onehot)", counting_dest)


if __name__ == "__main__":
    main()
