"""Packet-binned traversal measurement: intersect-stage A/B vs the streamed
walk on a realistic mid-bounce population, asserting bit-identity (the
per-ray candidate contract), plus an optional stage-level profile of the
binned pipeline (_packet_bins construction, record gather, kernel, reduce).

    python scripts/bench_binned.py scenes/cornell_mesh_200k.json [more.json]
    python scripts/bench_binned.py --profile --depth 4 --tier 4 SCENE.json

Module globals (PTT_BINNED_G / _TOPK / _PAIR_MEAN / _TIERS env vars) are
read at trace time, so variant sweeps run within one process by rebinding
ops.intersect_mxu attributes (see --profile).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mid_bounce_population(scn, res, depth, cfg):
    """Camera rays advanced `depth` diffuse bounces: the incoherent
    population the binned path targets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.ops import camera as camera_ops
    from project3_cuda_path_tracer_2025_tpu.ops import shade as shade_ops
    from project3_cuda_path_tracer_2025_tpu.ops.intersect import (
        intersect_scene,
        prim_t_min,
    )
    from project3_cuda_path_tracer_2025_tpu.scene import (
        load_scene,
        set_resolution,
    )
    from project3_cuda_path_tracer_2025_tpu.utils import prng
    from project3_cuda_path_tracer_2025_tpu.utils.timers import device_sync

    scene = set_resolution(load_scene(scn), res, res)
    r = Renderer(scene, cfg)
    n = r.static.pixel_count
    ikey = prng.iteration_key(r._base_key, jnp.int32(1))
    cam_u = prng.uniforms(prng.stage_key(ikey, 0, 0), n, 4)
    paths = camera_ops.generate_camera_rays(
        r._cam_state, r.static.width, r.static.height,
        r.static.trace_depth, cam_u,
    )

    @jax.jit
    def bounce(paths, d):
        isect = intersect_scene(r.dev, r.static, paths, cfg)
        su = prng.uniforms_at(prng.stage_key(ikey, d, 1), paths.pixel, 3, n)
        return shade_ops.shade(r.dev, r.static, paths, isect, su, cfg)

    for d in range(depth):
        paths = bounce(paths, jnp.int32(d))
    device_sync(paths.origin.x)
    t_lim = prim_t_min(r.static, cfg, paths.origin, paths.direction)
    alive = int(np.asarray(paths.alive).sum())
    print(
        f"\n=== {scn}: {r.static.num_triangles} tris, "
        f"live {alive}/{n} (depth {depth}) ===",
        flush=True,
    )
    return r, paths, t_lim


def ab_compare(scn, res, depth, k):
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m
    from project3_cuda_path_tracer_2025_tpu.utils.timers import device_sync

    import jax

    cfg = RenderConfig(mesh_intersector="mxu")
    interp = jax.default_backend() == "cpu"
    r, paths, t_lim = mid_bounce_population(scn, res, depth, cfg)
    ntri, ptri = r.static.num_triangles, r.static.mxu_padded_tris

    def isect(mode_kw):
        return m.mesh_intersect_mxu(
            r.dev.mxu_mesh, ntri, ptri, paths.origin, paths.direction,
            paths.alive, t_lim, cfg.baby_epsilon, sort_rays=True,
            mesh_bounds=r.static.mesh_bounds, compute_uv=False,
            sort_mode="signature", interpret=interp, **mode_kw,
        )

    outs = {}
    for name, kw in (
        ("streamed", dict(planned=True, streamed=True)),
        ("binned", dict(planned=True, streamed=True, binned=True)),
    ):
        mh = isect(kw)
        device_sync(mh.t)
        outs[name] = (np.asarray(mh.t), np.asarray(mh.tri))
        t0 = time.perf_counter()
        for _ in range(k):
            mh = isect(kw)
        device_sync(mh.t)
        dt = (time.perf_counter() - t0) * 1e3 / k
        print(f"{name:10s} {dt:8.2f} ms/intersect", flush=True)
    print(
        "bitexact t:",
        np.array_equal(outs["streamed"][0], outs["binned"][0]),
        " tri:",
        np.array_equal(outs["streamed"][1], outs["binned"][1]),
        flush=True,
    )


def profile(scn, res, depth, tier_div, k):
    """Stage-level profile over the sorted live prefix (tier 1/tier_div)."""
    import itertools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m
    from project3_cuda_path_tracer_2025_tpu.utils.timers import device_sync

    interp = jax.default_backend() == "cpu"
    cfg = RenderConfig(mesh_intersector="mxu")
    r, paths, t_lim = mid_bounce_population(scn, res, depth, cfg)
    tab = r.dev.mxu_mesh
    n = r.static.pixel_count
    n_pad = ((n + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE

    # Sorted rayf/tlim as mesh_intersect_mxu._run builds them (root cull +
    # recenter + signature sort), inlined for instrumentation.
    @jax.jit
    def pack():
        o, dd = paths.origin, paths.direction
        pad = lambda x, fill=0.0: jnp.pad(
            x, (0, n_pad - n), constant_values=fill
        )
        root = m.root_hit_mask(
            tab.tile_aabb, tab.center,
            o.x, o.y, o.z, dd.x, dd.y, dd.z, t_lim,
        )
        active = paths.alive & root
        osx = pad(o.x) - tab.center[0]
        osy = pad(o.y) - tab.center[1]
        osz = pad(o.z) - tab.center[2]
        dxp, dyp, dzp = pad(dd.x), pad(dd.y), pad(dd.z)
        one = jnp.where(pad(active.astype(jnp.float32)) > 0, 1.0, 0.0)
        zero = jnp.zeros_like(one)
        rayf = jnp.stack(
            [dxp * one, dyp * one, dzp * one,
             (osy * dzp - osz * dyp) * one,
             (osz * dxp - osx * dzp) * one,
             (osx * dyp - osy * dxp) * one,
             osx * one, osy * one, osz * one,
             one, zero, zero, zero, zero, zero, zero],
            axis=1,
        )
        tlim = pad(t_lim, 3.4e38)[:, None]
        key = m._signature_keys(
            tab.tile_aabb, osx, osy, osz, dxp, dyp, dzp, one, tlim[:, 0]
        )
        perm = jnp.argsort(key)
        return rayf[perm], tlim[perm]

    rayf, tlim_s = pack()
    device_sync(rayf)
    npre = min(
        n_pad,
        ((n_pad // tier_div + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE,
    )
    rayf_p, tlim_p = rayf[:npre], tlim_s[:npre]
    aabb_c, feat = tab.tile_aabb, tab.features
    g = m.BINNED_G
    gp = m.RAY_TILE // g
    n_g = npre // g
    # Same budget formula as _run_binned with the tier-INDEPENDENT anchor
    # (max(npre, n/4)) so stage timings describe the production kernel.
    ct = aabb_c.shape[0]
    n_gb = max(npre, n_pad // 4) // g
    pair_budget = n_gb * min(m.BINNED_PAIR_MEAN, ct) + gp * ct
    pair_budget = ((pair_budget + gp - 1) // gp) * gp

    def timeit(name, fn, *a):
        jf = jax.jit(fn)
        out = jf(*a)
        device_sync(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = jf(*a)
        device_sync(jax.tree_util.tree_leaves(out)[0])
        print(
            f"{name:28s} {(time.perf_counter() - t0) * 1e3 / k:8.2f} ms",
            flush=True,
        )
        return out

    src, vt, dst, ovf = timeit(
        "_packet_bins",
        lambda rp, tp: m._packet_bins(
            aabb_c, rp, tp, pair_budget, m.BINNED_TOPK
        ),
        rayf_p, tlim_p,
    )
    print(
        "  pairs: budget", pair_budget,
        " used", int(np.asarray(vt >= 0).sum()) * gp,
        " overflow", bool(np.asarray(ovf)),
        flush=True,
    )

    def gather_records(src, rp, tp):
        recs = jnp.concatenate(
            [rp.reshape(n_g, g * m.NUM_F), jnp.zeros((1, g * m.NUM_F))],
            axis=0,
        )
        pairf = recs[src].reshape(pair_budget * g, m.NUM_F)
        tlg = jnp.concatenate(
            [tp.reshape(n_g, g), jnp.zeros((1, g))], axis=0
        )
        return pairf, tlg[src].reshape(pair_budget * g, 1)

    timeit("record gather", gather_records, src, rayf_p, tlim_p)

    # Finer construction/reduce splits (the knobs worth attacking next).
    def hg_rank_slots(rp, tp):
        # the _packet_bins front half: slab sweep + rank matmul + slotmat
        o = rp[:, 6:9]; d = rp[:, 0:3]
        live = rp[:, 9] > 0.0
        tl = tp[:, 0]
        inv = 1.0 / jnp.where(d == 0.0, 1e-20, d)
        hs = []
        for c0 in range(0, ct, 16):
            rows = aabb_c[c0:c0 + 16]
            lo, hi = rows[:, 0:3], rows[:, 3:6]
            t1 = (lo[None] - o[:, None]) * inv[:, None]
            t2 = (hi[None] - o[:, None]) * inv[:, None]
            tlo = jnp.max(jnp.minimum(t1, t2), 2)
            thi = jnp.min(jnp.maximum(t1, t2), 2)
            tlo, thi = m._widen_slab(tlo, thi, k=2)
            h = (thi >= tlo) & (thi > 0.0) & (tlo < tl[:, None]) & live[:, None]
            hs.append(h.reshape(n_g, g, rows.shape[0]).any(1))
        return jnp.concatenate(hs, 1)

    hg = timeit("  hg slab sweep", hg_rank_slots, rayf_p, tlim_p)

    def topk_only(hg):
        neg, _ = jax.lax.top_k(-jnp.where(hg, jax.lax.broadcasted_iota(jnp.int32, hg.shape, 1), m._INT_BIG), min(m.BINNED_TOPK, ct) or ct)
        return -neg

    if m.BINNED_TOPK:
        dstx = timeit("  top_k alone", topk_only, hg)

        def scatter_src(dstx):
            return (
                jnp.full((pair_budget,), n_g, jnp.int32)
                .at[jnp.minimum(dstx, pair_budget).reshape(-1)]
                .set(jnp.broadcast_to(jax.lax.iota(jnp.int32, n_g)[:, None], dstx.shape).reshape(-1), mode="drop")
            )

        timeit("  src scatter", scatter_src, dstx)

    timeit(
        "binned e2e (_run_binned)",
        lambda rp, tp: m._run_binned(
            rp, feat, aabb_c, tp, cfg.baby_epsilon, interp, m.BINNED_TOPK
        ),
        rayf_p, tlim_p,
    )

    print("\n--- variant sweep (e2e binned intersect) ---", flush=True)
    base = (m.BINNED_G, m.BINNED_TOPK, m.BINNED_PAIR_MEAN)
    for G, TK in itertools.product((8,), (0, 96, 128, 10**6)):
        m.BINNED_G, m.BINNED_TOPK = G, TK
        m.BINNED_PAIR_MEAN = base[2] if G == 8 else base[2] + 6
        try:
            out = timeit(
                f"G={G} topk={TK} e2e",
                lambda rp, tp, TK=TK: m._run_binned(
                    rp, feat, aabb_c, tp, cfg.baby_epsilon, interp, TK
                ),
                rayf_p, tlim_p,
            )
            print(f"   overflow={bool(np.asarray(out[2]))}", flush=True)
        except Exception as e:  # variant may exceed a budget guard
            print(f"G={G} topk={TK} FAILED: {str(e)[:200]}", flush=True)
    m.BINNED_G, m.BINNED_TOPK, m.BINNED_PAIR_MEAN = base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="+")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--depth", type=int, default=2,
                    help="bounces to advance before measuring")
    ap.add_argument("--k", type=int, default=8, help="timing chain length")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="stage-level profile instead of the A/B")
    ap.add_argument("--tier", type=int, default=4,
                    help="profile: live-prefix divisor")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print("backend:", jax.default_backend(), flush=True)
    for scn in args.scenes:
        if args.profile:
            profile(scn, args.res, args.depth, args.tier, args.k)
        else:
            ab_compare(scn, args.res, args.depth, args.k)


if __name__ == "__main__":
    main()
