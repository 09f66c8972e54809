"""Mesh-traversal diagnostics: where does a heavy-mesh bounce actually go?

For a realistic mid-bounce ray population (camera rays advanced one diffuse
bounce), measures per sort mode (off / morton / signature):

  * per-ray candidate-tile counts (the per-ray BVH-style floor),
  * per-block candidate UNION sizes (what the planned kernel actually
    visits), per chunk of the >32k-tri chain,
  * stage timings: resort key+argsort+apply, plan prepass, kernel.

    python scripts/diag_mesh_traversal.py --scene scenes/cornell_mesh_80k.json
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
    ap.add_argument("--k", type=int, default=8, help="timing chain length")
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
    from project3_cuda_path_tracer_2025_tpu.ops.intersect import prim_t_min
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution
    from project3_cuda_path_tracer_2025_tpu.utils.timers import device_sync

    scene = set_resolution(load_scene(args.scene), args.res, args.res)
    scene.state.trace_depth = 2
    cfg = RenderConfig(mesh_intersector="mxu", ray_sorting="off")
    r = Renderer(scene, cfg)
    r.step()  # film now holds bounce-advanced state; re-generate by hand:

    # Reconstruct a mid-bounce population: camera rays, one full bounce.
    from project3_cuda_path_tracer_2025_tpu.models.megakernel import (
        megakernel_iteration,
    )
    from project3_cuda_path_tracer_2025_tpu.ops import camera as camera_ops
    from project3_cuda_path_tracer_2025_tpu.ops import shade as shade_ops
    from project3_cuda_path_tracer_2025_tpu.ops.intersect import intersect_scene
    from project3_cuda_path_tracer_2025_tpu.utils import prng

    n = r.static.pixel_count
    ikey = prng.iteration_key(r._base_key, jnp.int32(1))
    cam_u = prng.uniforms(prng.stage_key(ikey, 0, 0), n, 4)
    paths = camera_ops.generate_camera_rays(
        r._cam_state, r.static.width, r.static.height, r.static.trace_depth,
        cam_u,
    )

    @jax.jit
    def one_bounce(paths):
        isect = intersect_scene(r.dev, r.static, paths, cfg)
        su = prng.uniforms_at(prng.stage_key(ikey, 0, 1), paths.pixel, 3, n)
        return shade_ops.shade(r.dev, r.static, paths, isect, su, cfg)

    paths = one_bounce(paths)
    device_sync(paths.origin.x)
    tables = r.dev.mxu_mesh
    ct = tables.tile_aabb.shape[0]
    print(f"{args.scene}: {r.static.num_triangles} tris, {ct} tiles, "
          f"{n} rays, backend={jax.default_backend()}")

    t_lim = prim_t_min(r.static, cfg, paths.origin, paths.direction)
    active = paths.alive

    # ---- per-ray candidate counts (H row sums) ---------------------------
    c = tables.center
    root = m.root_hit_mask(
        tables.tile_aabb, c, paths.origin.x, paths.origin.y, paths.origin.z,
        paths.direction.x, paths.direction.y, paths.direction.z, t_lim,
    )
    live = active & root

    @jax.jit
    def ray_cand_counts():
        o = jnp.stack([paths.origin.x - c[0], paths.origin.y - c[1],
                       paths.origin.z - c[2]], 1)
        d = jnp.stack([paths.direction.x, paths.direction.y,
                       paths.direction.z], 1)
        ids, tlo, cnt_r = None, None, jnp.zeros((n,), jnp.int32)
        inv = 1.0 / jnp.where(d == 0.0, 1e-20, d)
        for c0 in range(0, ct, 16):
            rows = tables.tile_aabb[c0:c0 + 16]
            lo, hi = rows[:, 0:3], rows[:, 3:6]
            t1 = (lo[None] - o[:, None]) * inv[:, None]
            t2 = (hi[None] - o[:, None]) * inv[:, None]
            tlo_ = jnp.max(jnp.minimum(t1, t2), -1)
            thi_ = jnp.min(jnp.maximum(t1, t2), -1)
            h = (thi_ >= tlo_) & (thi_ > 0.0) & (tlo_ < t_lim[:, None]) & live[:, None]
            cnt_r = cnt_r + jnp.sum(h, 1, dtype=jnp.int32)
        return cnt_r

    cnt_r = np.asarray(ray_cand_counts())
    lv = np.asarray(live)
    print(f"live rays: {lv.sum()}/{n} ({100*lv.mean():.1f}%)")
    cr = cnt_r[lv]
    print(f"per-ray candidates: mean {cr.mean():.2f}  p50 {np.percentile(cr,50):.0f}"
          f"  p90 {np.percentile(cr,90):.0f}  p99 {np.percentile(cr,99):.0f}"
          f"  max {cr.max()}  sum {cr.sum()}")

    # ---- per-block unions under each sort --------------------------------
    chunk_tiles = min(ct, m.CHUNK_TRIS // m.TRI_TILE)
    for mode in ("off", "morton", "signature"):
        if mode == "off":
            perm = jnp.arange(n)
        else:
            perm = m.coherence_perm(
                tables, paths.origin, paths.direction, active, t_lim,
                cfg.ray_sort_bits, cfg.ray_sort_dir_bits, mode=mode,
            )
        ox = paths.origin.x[perm]; oy = paths.origin.y[perm]; oz = paths.origin.z[perm]
        dx = paths.direction.x[perm]; dy = paths.direction.y[perm]; dz = paths.direction.z[perm]
        tl = t_lim[perm]; lv_p = live[perm]

        @jax.jit
        def block_stats():
            n_pad = ((n + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE
            pad = lambda x, f=0.0: jnp.pad(x, (0, n_pad - n), constant_values=f)
            o = jnp.stack([pad(ox) - c[0], pad(oy) - c[1], pad(oz) - c[2]], 1)
            d = jnp.stack([pad(dx), pad(dy), pad(dz)], 1)
            one = pad(lv_p.astype(jnp.float32))
            tlp = pad(tl, 3.4e38)
            totals = []
            for g0 in range(0, ct, chunk_tiles):
                aabb_c = tables.tile_aabb[g0:g0 + chunk_tiles]
                ids, tlo, cnt = m._build_tile_plan(
                    aabb_c, o, d, one, tlp
                )
                totals.append(cnt)
            return jnp.stack(totals)  # [n_chunks, NB]

        bs = np.asarray(block_stats())
        nb = bs.shape[1]
        per_block = bs.sum(0)
        # blocks with any live ray
        lvb = np.asarray(lv_p)
        padded = np.zeros(((n + 255) // 256) * 256, bool)
        padded[:n] = lvb
        blk_live = padded.reshape(-1, 256).any(1)
        ub = per_block[blk_live]
        print(f"[{mode:9s}] live blocks {blk_live.sum()}/{nb}; union/block: "
              f"mean {ub.mean():.2f} p50 {np.percentile(ub,50):.0f} "
              f"p90 {np.percentile(ub,90):.0f} max {ub.max()} "
              f"sum {per_block.sum()} (vs per-ray-sum floor {cr.sum()/256:.0f} blocks-equiv)")

    # ---- stage timings ----------------------------------------------------
    def timed(name, fn):
        f = jax.jit(fn)
        out = f()
        device_sync(out)
        t0 = time.perf_counter()
        out = f()
        device_sync(out)
        ms = (time.perf_counter() - t0) * 1e3 / args.k
        print(f"{name:30s} {ms:8.2f} ms")

    def chain(stage):
        def body():
            s = 0.0
            x = paths.origin.x
            for _ in range(args.k):
                out = stage(x)
                s = out if isinstance(out, float) else out
                x = paths.origin.x + 0.0 * jnp.ravel(jnp.asarray(s))[0]
            return s
        return body

    def st_key_sig(x):
        p2 = paths._replace(origin=paths.origin._replace(x=x))
        return m.coherence_perm(tables, p2.origin, p2.direction, active,
                                t_lim, 2, 4, mode="signature").astype(jnp.float32)

    def st_key_mor(x):
        p2 = paths._replace(origin=paths.origin._replace(x=x))
        return m.coherence_perm(tables, p2.origin, p2.direction, active,
                                t_lim, 2, 4, mode="morton").astype(jnp.float32)

    def st_intersect(x):
        p2 = paths._replace(origin=paths.origin._replace(x=x))
        mh = m.mesh_intersect_mxu(
            tables, r.static.num_triangles, r.static.mxu_padded_tris,
            p2.origin, p2.direction, active, t_lim, cfg.baby_epsilon,
            sort_rays=True, mesh_bounds=r.static.mesh_bounds,
            interpret=jax.default_backend() == "cpu", compute_uv=False,
            planned=True, sort_mode="signature",
        )
        return mh.t

    def st_intersect_mor(x):
        p2 = paths._replace(origin=paths.origin._replace(x=x))
        mh = m.mesh_intersect_mxu(
            tables, r.static.num_triangles, r.static.mxu_padded_tris,
            p2.origin, p2.direction, active, t_lim, cfg.baby_epsilon,
            sort_rays=True, mesh_bounds=r.static.mesh_bounds,
            interpret=jax.default_backend() == "cpu", compute_uv=False,
            planned=True, sort_mode="morton",
        )
        return mh.t

    def st_plan(x):
        # the chunked chain's plan prepasses alone (per-chunk slabs + sorts)
        n_pad = ((n + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE
        pad = lambda v, f=0.0: jnp.pad(v, (0, n_pad - n), constant_values=f)
        o = jnp.stack([pad(paths.origin.x + 0.0 * x[0]) - c[0],
                       pad(paths.origin.y) - c[1],
                       pad(paths.origin.z) - c[2]], 1)
        d = jnp.stack([pad(paths.direction.x), pad(paths.direction.y),
                       pad(paths.direction.z)], 1)
        one = pad(live.astype(jnp.float32))
        tlp = pad(t_lim, 3.4e38)
        acc = 0.0
        for g0 in range(0, ct, chunk_tiles):
            ids, tlo, cnt = m._build_tile_plan(
                tables.tile_aabb[g0:g0 + chunk_tiles], o, d, one, tlp
            )
            acc = acc + jnp.sum(cnt).astype(jnp.float32)
        return acc

    def st_rootcull(x):
        return m.root_hit_mask(
            tables.tile_aabb, c, paths.origin.x + 0.0 * x[0], paths.origin.y,
            paths.origin.z, paths.direction.x, paths.direction.y,
            paths.direction.z, t_lim,
        ).astype(jnp.float32)

    timed("key+argsort (signature)", chain(st_key_sig))
    timed("key+argsort (morton)", chain(st_key_mor))
    timed("root cull alone", chain(st_rootcull))
    timed("plan prepass (all chunks)", chain(st_plan))
    timed("FULL intersect (signature)", chain(st_intersect))
    timed("FULL intersect (morton)", chain(st_intersect_mor))


if __name__ == "__main__":
    main()
