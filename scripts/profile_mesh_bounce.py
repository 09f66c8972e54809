"""Per-stage profile of the PRODUCTION fused mesh bounce.

VERDICT round-3 #2: the 5k mesh sits at ~18 ms/bounce, far above its tiny
kernel time -- find where the full-[N] XLA floor actually goes.  Stages are
timed independently with the chained-K trick (device_sync scalar fetch; the
axon backend's block_until_ready is a no-op) on a realistic mid-bounce
population:

  prim_t_min | key build | argsort | key+argsort | permute apply | RNG
  draws | MXU intersect (sort_rays=False) | attr resolve+normal | fused
  shade kernel | WHOLE bounce

    python scripts/profile_mesh_bounce.py --scene scenes/cornell_mesh_5k.json
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/cornell_mesh_5k.json")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--only", default=None,
                    help="substring filter: run only matching stages")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.ops import fused
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
    interpret = jax.default_backend() == "cpu"
    print(f"{args.scene}: {r.static.num_triangles} tris, "
          f"{tables.tile_aabb.shape[0]} tiles, {n} rays, "
          f"backend={jax.default_backend()}", flush=True)

    # Mid-bounce population: camera rays + one full bounce.
    @jax.jit
    def bounced(iteration):
        ikey = prng.iteration_key(r._base_key, iteration)
        cam_u = prng.uniforms(prng.stage_key(ikey, 0, 0), n, 4)
        paths = camera_ops.generate_camera_rays(
            r._cam_state, r.static.width, r.static.height,
            r.static.trace_depth, cam_u,
        )
        isect = intersect_scene(r.dev, r.static, paths, cfg)
        su = prng.uniforms_at(prng.stage_key(ikey, 0, 1), paths.pixel, 3, n)
        return shade_ops.shade(r.dev, r.static, paths, isect, su, cfg)

    paths = jax.tree_util.tree_map(jnp.asarray, bounced(jnp.int32(1)))
    device_sync(paths.origin.x)
    skey = prng.stage_key(prng.iteration_key(r._base_key, jnp.int32(1)), 1, 1)
    flags = m.traversal_flags(
        "auto", r.static.mxu_padded_tris,
        binned_tiers=cfg.mxu_binned_tiers, binned_budget_rays=n,
    )

    sync_ms = [None]  # measured device_sync round-trip, calibrated below

    def timed(name, stage, seed_x=None, k=None):
        """stage: jnp[n] -> array; chained k times through a scalar dep.
        The ONE device_sync per timing costs a ~22 ms tunnel round-trip
        which would inflate every stage by 22/k ms (this distorted the
        round-3 'wrapper stages cost 15 ms' reading) -- an empty-chain
        calibration run measures it and every stage subtracts sync/k.
        Transient tunnel errors (HTTP 500 / truncated body) skip the stage
        instead of killing the run.  Whole-bounce stages pass a small k:
        chaining 16 copies of the full bounce program exceeds the
        TpuExecutableProto serialization limit (observed 2.7 GB metadata)."""
        if args.only and not any(s in name for s in args.only.split(",")):
            return float("nan")
        k = k or args.k

        def chain(x0):
            x = x0
            for _ in range(k):
                out = stage(x)
                x = x0 + 0.0 * jnp.ravel(out)[0]
            return x

        x0 = paths.origin.x if seed_x is None else seed_x
        try:
            if sync_ms[0] is None:
                g = jax.jit(lambda x: x + 1.0)
                out = g(x0)
                device_sync(out)
                reps = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    out = g(out)
                    device_sync(out)
                    reps.append(time.perf_counter() - t0)
                sync_ms[0] = min(reps) * 1e3
                print(f"{'[sync calibration]':34s} {sync_ms[0]:8.2f} ms",
                      flush=True)
            f = jax.jit(chain)
            out = f(x0)
            device_sync(out)
            t0 = time.perf_counter()
            out = f(x0)
            device_sync(out)
        except Exception as e:  # noqa: BLE001 -- tunnel flakiness
            print(f"{name:34s}  ERROR {str(e)[:120]}", flush=True)
            return float("nan")
        ms = ((time.perf_counter() - t0) * 1e3 - sync_ms[0]) / k
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    def with_x(x):
        return paths._replace(origin=paths.origin._replace(x=x))

    t_lim0 = prim_t_min(r.static, cfg, paths.origin, paths.direction)

    timed("prim_t_min", lambda x: prim_t_min(
        r.static, cfg, with_x(x).origin, with_x(x).direction))

    def key_only(x):
        p = with_x(x)
        c = tables.center
        return m._signature_keys(
            tables.tile_aabb, p.origin.x - c[0], p.origin.y - c[1],
            p.origin.z - c[2], p.direction.x, p.direction.y, p.direction.z,
            p.alive.astype(jnp.float32), t_lim0,
        ).astype(jnp.float32)

    timed("signature key build", key_only)
    timed("argsort(key)", lambda x: jnp.argsort(
        key_only(x).astype(jnp.int32)).astype(jnp.float32))
    timed("coherence_perm (key+sort)", lambda x: m.coherence_perm(
        tables, with_x(x).origin, with_x(x).direction, paths.alive, t_lim0,
        cfg.ray_sort_bits, cfg.ray_sort_dir_bits, mode="signature",
    ).astype(jnp.float32))

    perm0 = m.coherence_perm(
        tables, paths.origin, paths.direction, paths.alive, t_lim0,
        cfg.ray_sort_bits, cfg.ray_sort_dir_bits, mode="signature",
    )

    def apply_only(x):
        p, tl = fused._permute_bounce_state(with_x(x), t_lim0, perm0, max_id=n)
        return p.origin.x + tl

    timed("permute apply [N,12] gather", apply_only)

    def apply_fields(x):
        p = jax.tree_util.tree_map(lambda a: a[perm0], with_x(x))
        return p.origin.x + t_lim0[perm0]

    timed("permute apply per-field x12", apply_fields)
    timed("rng uniforms_at x3", lambda x: prng.uniforms_at(
        skey, with_x(x).pixel, 3, n)[0] + 0.0 * x[0])

    # Production kernel conditions: the persistent sort has ALREADY packed
    # the state -- time the kernel on the sorted population.
    s_paths, s_tlim = fused._permute_bounce_state(paths, t_lim0, perm0, max_id=n)
    s_paths = jax.tree_util.tree_map(jnp.asarray, s_paths)
    s_tlim = jnp.asarray(s_tlim)

    def with_xs(x):
        return s_paths._replace(origin=s_paths.origin._replace(x=x))

    def isect_sorted(x):
        p = with_xs(x)
        mh = m.mesh_intersect_mxu(
            tables, r.static.num_triangles, r.static.mxu_padded_tris,
            p.origin, p.direction, p.alive, s_tlim, cfg.baby_epsilon,
            sort_rays=False, mesh_bounds=r.static.mesh_bounds,
            interpret=interpret, compute_uv=False, **flags,
        )
        return mh.t

    def isect_unsorted(x):
        p = with_x(x)
        mh = m.mesh_intersect_mxu(
            tables, r.static.num_triangles, r.static.mxu_padded_tris,
            p.origin, p.direction, p.alive, t_lim0, cfg.baby_epsilon,
            sort_rays=False, mesh_bounds=r.static.mesh_bounds,
            interpret=interpret, compute_uv=False, **flags,
        )
        return mh.t

    # Plan prepass alone (the XLA slab pass + per-block row sort the
    # planned/streamed walks consume), on the sorted population.
    c = tables.center
    ct = tables.tile_aabb.shape[0]
    chunk_tiles = min(ct, m.CHUNK_TRIS // m.TRI_TILE)

    def plan_only(x):
        n_pad = ((n + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE
        pad = lambda v, f=0.0: jnp.pad(v, (0, n_pad - n), constant_values=f)
        o = jnp.stack([pad(x) - c[0], pad(s_paths.origin.y) - c[1],
                       pad(s_paths.origin.z) - c[2]], 1)
        d = jnp.stack([pad(s_paths.direction.x), pad(s_paths.direction.y),
                       pad(s_paths.direction.z)], 1)
        one = pad(s_paths.alive.astype(jnp.float32))
        tlp = pad(s_tlim, 3.4e38)
        acc = None
        for g0 in range(0, ct, chunk_tiles):
            ids, tlo, cnt = m._build_tile_plan(
                tables.tile_aabb[g0:g0 + chunk_tiles], o, d, one, tlp
            )
            acc = cnt if acc is None else acc + cnt
        return acc.astype(jnp.float32)

    def plan_frustum_only(x):
        n_pad = ((n + m.RAY_TILE - 1) // m.RAY_TILE) * m.RAY_TILE
        pad = lambda v, f=0.0: jnp.pad(v, (0, n_pad - n), constant_values=f)
        o = jnp.stack([pad(x) - c[0], pad(s_paths.origin.y) - c[1],
                       pad(s_paths.origin.z) - c[2]], 1)
        d = jnp.stack([pad(s_paths.direction.x), pad(s_paths.direction.y),
                       pad(s_paths.direction.z)], 1)
        one = pad(s_paths.alive.astype(jnp.float32))
        tlp = pad(s_tlim, 3.4e38)
        acc = None
        for g0 in range(0, ct, chunk_tiles):
            ids, tlo, cnt = m._build_tile_plan_frustum(
                tables.tile_aabb[g0:g0 + chunk_tiles], o, d, one, tlp
            )
            acc = cnt if acc is None else acc + cnt
        return acc.astype(jnp.float32)

    timed("tile plan prepass (XLA)", plan_only, seed_x=s_paths.origin.x)
    timed("frustum plan prepass", plan_frustum_only, seed_x=s_paths.origin.x)
    timed("MXU intersect (SORTED state)", isect_sorted, seed_x=s_paths.origin.x)

    def isect_frustum(x):
        p = with_xs(x)
        mh = m.mesh_intersect_mxu(
            tables, r.static.num_triangles, r.static.mxu_padded_tris,
            p.origin, p.direction, p.alive, s_tlim, cfg.baby_epsilon,
            sort_rays=False, mesh_bounds=r.static.mesh_bounds,
            interpret=interpret, compute_uv=False, plan_frustum=True,
            **flags,
        )
        return mh.t

    timed("MXU intersect (frustum plan)", isect_frustum,
          seed_x=s_paths.origin.x)

    def isect_mode(mode_flags):
        def f(x):
            p = with_xs(x)
            mh = m.mesh_intersect_mxu(
                tables, r.static.num_triangles, r.static.mxu_padded_tris,
                p.origin, p.direction, p.alive, s_tlim, cfg.baby_epsilon,
                sort_rays=False, mesh_bounds=r.static.mesh_bounds,
                interpret=interpret, compute_uv=False, **mode_flags,
            )
            return mh.t
        return f

    for alt in ("sweep", "planned", "streamed"):
        fl = m.traversal_flags(alt, r.static.mxu_padded_tris)
        if fl == flags:
            continue
        timed(f"MXU intersect {alt} (sorted)", isect_mode(fl),
              seed_x=s_paths.origin.x)

    timed("MXU intersect (unsorted A/B)", isect_unsorted)

    mh0 = m.mesh_intersect_mxu(
        tables, r.static.num_triangles, r.static.mxu_padded_tris,
        s_paths.origin, s_paths.direction, s_paths.alive, s_tlim,
        cfg.baby_epsilon, sort_rays=False,
        mesh_bounds=r.static.mesh_bounds, interpret=interpret,
        compute_uv=False, **flags,
    )
    mh0 = jax.tree_util.tree_map(jnp.asarray, mh0)

    def attr_only(x):
        at = m.resolve_shade_attributes(
            tables, r.static.mxu_padded_tris, mh0.tri + 0 * x[:1].astype(jnp.int32)
        )
        return at[:, 0]

    timed("attr resolve [Tp,19] gather", attr_only)

    def bounce_whole(x):
        return fused.fused_mesh_bounce(
            r.dev, r.static, cfg.replace(ray_sorting="on"), with_x(x),
            su_key=skey, interpret=interpret, resort=True, rng_n=n,
        ).origin.x

    timed("WHOLE fused bounce (sorted)", bounce_whole, k=4)

    def bounce_tiered(x):
        return fused.fused_mesh_bounce(
            r.dev, r.static,
            cfg.replace(ray_sorting="on", bounce_prefix_tiers=(4, 2)),
            with_x(x), su_key=skey, interpret=interpret, resort=True,
            rng_n=n,
        ).origin.x

    timed("WHOLE fused bounce (tiers 4,2)", bounce_tiered, k=4)

    def bounce_pixel_order(x):
        return fused.fused_mesh_bounce(
            r.dev, r.static,
            cfg.replace(ray_sorting="on", mesh_state_order="pixel"),
            with_x(x), su_key=skey, interpret=interpret, resort=True,
            rng_n=n,
        ).origin.x

    timed("WHOLE fused bounce (pixel-order)", bounce_pixel_order, k=4)

    def bounce_planned_tiered(x):
        return fused.fused_mesh_bounce(
            r.dev, r.static,
            cfg.replace(
                ray_sorting="on", bounce_prefix_tiers=(4, 2),
                mxu_traversal="planned",
            ),
            with_x(x), su_key=skey, interpret=interpret, resort=True,
            rng_n=n,
        ).origin.x

    timed("WHOLE bounce (planned, tiers)", bounce_planned_tiered, k=4)


if __name__ == "__main__":
    main()
