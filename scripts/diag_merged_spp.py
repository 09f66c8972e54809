"""Merged-spp diagnostic: does a denser ray population shrink block unions?

The designed round-4 candidate (PARITY.md "merged-spp wavefronts") traces S
spp as one S*N-ray population so the coherence sort packs 256-ray blocks from
a denser ray set.  Win condition: per-block tile-union work per spp falls
with S (union_sum(S)/S < union_sum(1)), and the measured full-intersect time
per spp falls with it.  This script measures BOTH on real populations:

  * stacks S independently-bounced mid-bounce populations (iterations 1..S,
    exactly the rays a merged-spp integrator would trace),
  * reports per-ray candidate floors, per-block unions after the coherence
    sort, and per-spp union work for S in {1, 2, 4},
  * times the actual sorted mesh_intersect_mxu on each stacked population
    (auto traversal -- whatever production would run).

    python scripts/diag_merged_spp.py --scene scenes/cornell_mesh_80k.json
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/cornell_mesh_80k.json")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smax", type=int, default=4)
    ap.add_argument("--k", type=int, default=8, help="timing chain length")
    ap.add_argument("--no-time", action="store_true",
                    help="union stats only (skip kernel timing compiles)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m
    from project3_cuda_path_tracer_2025_tpu.ops import camera as camera_ops
    from project3_cuda_path_tracer_2025_tpu.ops import shade as shade_ops
    from project3_cuda_path_tracer_2025_tpu.ops.intersect import (
        intersect_scene,
        prim_t_min,
    )
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution
    from project3_cuda_path_tracer_2025_tpu.utils import prng
    from project3_cuda_path_tracer_2025_tpu.utils.timers import device_sync

    scene = set_resolution(load_scene(args.scene), args.res, args.res)
    cfg = RenderConfig(mesh_intersector="mxu", ray_sorting="off")
    r = Renderer(scene, cfg)

    n = r.static.pixel_count
    tables = r.dev.mxu_mesh
    ct = tables.tile_aabb.shape[0]
    c = tables.center
    print(f"{args.scene}: {r.static.num_triangles} tris, {ct} tiles, "
          f"{n} rays/spp, backend={jax.default_backend()}", flush=True)

    @jax.jit
    def bounced_population(iteration):
        """Camera rays of `iteration`, advanced one full bounce."""
        ikey = prng.iteration_key(r._base_key, iteration)
        cam_u = prng.uniforms(prng.stage_key(ikey, 0, 0), n, 4)
        paths = camera_ops.generate_camera_rays(
            r._cam_state, r.static.width, r.static.height,
            r.static.trace_depth, cam_u,
        )
        isect = intersect_scene(r.dev, r.static, paths, cfg)
        su = prng.uniforms_at(prng.stage_key(ikey, 0, 1), paths.pixel, 3, n)
        paths = shade_ops.shade(r.dev, r.static, paths, isect, su, cfg)
        t_lim = prim_t_min(r.static, cfg, paths.origin, paths.direction)
        return (paths.origin.x, paths.origin.y, paths.origin.z,
                paths.direction.x, paths.direction.y, paths.direction.z,
                paths.alive, t_lim)

    pops = [bounced_population(jnp.int32(i + 1)) for i in range(args.smax)]
    pops = [tuple(np.asarray(a) for a in p) for p in pops]
    device_sync(jnp.zeros(()))

    from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3

    chunk_tiles = min(ct, m.CHUNK_TRIS // m.TRI_TILE)

    svals = [s for s in (1, 2, 4, 8) if s <= args.smax]
    for S in svals:
        ox, oy, oz, dx, dy, dz, alive, t_lim = (
            np.concatenate([p[i] for p in pops[:S]]) for i in range(8)
        )
        ns = n * S
        ro = Vec3(jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oz))
        rd = Vec3(jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dz))
        alive_j = jnp.asarray(alive)
        tl_j = jnp.asarray(t_lim)

        @jax.jit
        def stats(ro=ro, rd=rd, alive_j=alive_j, tl_j=tl_j, ns=ns):
            root = m.root_hit_mask(
                tables.tile_aabb, c, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, tl_j
            )
            live = alive_j & root
            perm = m.coherence_perm(
                tables, ro, rd, alive_j, tl_j,
                cfg.ray_sort_bits, cfg.ray_sort_dir_bits, mode="signature",
            )
            oxp, oyp, ozp = ro.x[perm], ro.y[perm], ro.z[perm]
            dxp, dyp, dzp = rd.x[perm], rd.y[perm], rd.z[perm]
            lvp = live[perm]
            tlp_ = tl_j[perm]
            n_pad = ((ns + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE
            pad = lambda x, f=0.0: jnp.pad(x, (0, n_pad - ns), constant_values=f)
            o = jnp.stack([pad(oxp) - c[0], pad(oyp) - c[1], pad(ozp) - c[2]], 1)
            d = jnp.stack([pad(dxp), pad(dyp), pad(dzp)], 1)
            one = pad(lvp.astype(jnp.float32))
            tlp = pad(tlp_, 3.4e38)
            totals = []
            for g0 in range(0, ct, chunk_tiles):
                ids, tlo, cnt = m._build_tile_plan(
                    tables.tile_aabb[g0:g0 + chunk_tiles], o, d, one, tlp
                )
                totals.append(cnt)
            # per-ray candidate counts (the per-ray BVH floor)
            invx = 1.0 / jnp.where(d[:, 0] == 0.0, 1e-20, d[:, 0])
            invy = 1.0 / jnp.where(d[:, 1] == 0.0, 1e-20, d[:, 1])
            invz = 1.0 / jnp.where(d[:, 2] == 0.0, 1e-20, d[:, 2])
            cnt_r = jnp.zeros((n_pad,), jnp.int32)
            for c0 in range(0, ct, 16):
                rows = tables.tile_aabb[c0:c0 + 16]
                lo, hi = rows[:, 0:3], rows[:, 3:6]
                t1 = (lo[None, :, 0] - o[:, None, 0]) * invx[:, None]
                t2 = (hi[None, :, 0] - o[:, None, 0]) * invx[:, None]
                tlo_ = jnp.minimum(t1, t2); thi_ = jnp.maximum(t1, t2)
                t1 = (lo[None, :, 1] - o[:, None, 1]) * invy[:, None]
                t2 = (hi[None, :, 1] - o[:, None, 1]) * invy[:, None]
                tlo_ = jnp.maximum(tlo_, jnp.minimum(t1, t2))
                thi_ = jnp.minimum(thi_, jnp.maximum(t1, t2))
                t1 = (lo[None, :, 2] - o[:, None, 2]) * invz[:, None]
                t2 = (hi[None, :, 2] - o[:, None, 2]) * invz[:, None]
                tlo_ = jnp.maximum(tlo_, jnp.minimum(t1, t2))
                thi_ = jnp.minimum(thi_, jnp.maximum(t1, t2))
                h = ((thi_ >= tlo_) & (thi_ > 0.0)
                     & (tlo_ < tlp[:, None]) & (one[:, None] > 0))
                cnt_r = cnt_r + jnp.sum(h, 1, dtype=jnp.int32)
            return jnp.stack(totals), cnt_r, lvp, live

        bs, cnt_r, lvp, live = (np.asarray(x) for x in stats())
        nb = bs.shape[1]
        per_block = bs.sum(0)
        padded = np.zeros(nb * m.RAY_TILE, bool)
        padded[:ns] = lvp
        blk_live = padded.reshape(-1, m.RAY_TILE).any(1)
        ub = per_block[blk_live]
        pr = cnt_r[padded]
        print(
            f"S={S}: live {live.sum()}/{ns} | live blocks {blk_live.sum()}/{nb} | "
            f"union/blk mean {ub.mean():.1f} p90 {np.percentile(ub, 90):.0f} "
            f"max {ub.max()} | union_sum {per_block.sum()} "
            f"(per spp {per_block.sum() / S:.0f}) | per-ray floor sum {pr.sum()} "
            f"(per spp {pr.sum() / S:.0f}, mean {pr.mean():.2f})",
            flush=True,
        )

        if args.no_time:
            continue

        # --- the real thing: sorted production intersect on this population
        flags = m.traversal_flags(
            cfg.mxu_traversal, r.static.mxu_padded_tris,
            binned_tiers=cfg.mxu_binned_tiers, binned_budget_rays=ns,
        )

        def st_intersect(x, ro=ro, rd=rd, alive_j=alive_j, tl_j=tl_j):
            ro2 = Vec3(ro.x + 0.0 * x[0], ro.y, ro.z)
            mh = m.mesh_intersect_mxu(
                tables, r.static.num_triangles, r.static.mxu_padded_tris,
                ro2, rd, alive_j, tl_j, cfg.baby_epsilon,
                sort_rays=True, sort_bits=cfg.ray_sort_bits,
                sort_dir_bits=cfg.ray_sort_dir_bits, sort_mode="signature",
                mesh_bounds=r.static.mesh_bounds,
                interpret=jax.default_backend() == "cpu", compute_uv=False,
                **flags,
            )
            return mh.t

        def chain():
            s = ro.x
            for _ in range(args.k):
                s = ro.x + 0.0 * st_intersect(s)[0] + 0.0 * s[0]
            return s

        f = jax.jit(chain)
        out = f()
        device_sync(out)
        t0 = time.perf_counter()
        out = f()
        device_sync(out)
        ms = (time.perf_counter() - t0) * 1e3 / args.k
        print(f"S={S}: FULL sorted intersect {ms:8.2f} ms "
              f"({ms / S:.2f} ms/spp)", flush=True)


if __name__ == "__main__":
    main()
