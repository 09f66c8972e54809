"""Traversal-kernel roofline on the 5k mesh (VERDICT round-4 #10).

Times the PRODUCTION traversal kernel (whatever `mxu_traversal="auto"`
resolves to) on the realistic mid-bounce population and reports achieved
hardware utilization next to the ms numbers, so "epilogue-bound" claims
carry a utilization figure and future rounds can see headroom at a
glance:

  * mxu_tflops / mxu_peak_frac: MXU work = visits x 2*R*16*4T flops
    against the measured v5e f32 peak (148 TFLOP/s, CLAUDE.md).
  * hbm_gbps: bytes the kernel must move per bounce (ray features in,
    winner planes out; the 5k feature table is VMEM-resident) over the
    kernel time, against ~800 GB/s class HBM.
  * vpu_gelem_ops: estimated full-width elementwise slots executed
    (visits x ~24 ops x R x T) per second -- the bound the kernel
    actually sits at.

Prints ONE JSON line; bench.py merges it into the headline output.

    python scripts/roofline_mesh.py [--scene ...] [--k 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/cornell_mesh_5k.json")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.ops import camera as camera_ops
    from project3_cuda_path_tracer_2025_tpu.ops import fused
    from project3_cuda_path_tracer_2025_tpu.ops import intersect_mxu as m
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

    R, T = m.RAY_TILE, m.TRI_TILE
    scene = set_resolution(load_scene(args.scene), args.res, args.res)
    cfg = RenderConfig(mesh_intersector="mxu", ray_sorting="off")
    r = Renderer(scene, cfg)
    n = r.static.pixel_count
    tables = r.dev.mxu_mesh
    interpret = jax.default_backend() == "cpu"
    mode = m.resolve_traversal_mode("auto", r.static.mxu_padded_tris)
    flags = m.traversal_flags("auto", r.static.mxu_padded_tris,
                              binned_tiers=cfg.mxu_binned_tiers,
                              binned_budget_rays=n)

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
    t_lim0 = prim_t_min(r.static, cfg, paths.origin, paths.direction)
    perm0 = m.coherence_perm(
        tables, paths.origin, paths.direction, paths.alive, t_lim0,
        cfg.ray_sort_bits, cfg.ray_sort_dir_bits, mode="signature",
    )
    s_paths, s_tlim = fused._permute_bounce_state(
        paths, t_lim0, perm0, max_id=n
    )
    s_paths = jax.tree_util.tree_map(jnp.asarray, s_paths)
    s_tlim = jnp.asarray(s_tlim)

    def isect_sorted(x):
        p = s_paths._replace(origin=s_paths.origin._replace(x=x))
        mh = m.mesh_intersect_mxu(
            tables, r.static.num_triangles, r.static.mxu_padded_tris,
            p.origin, p.direction, p.alive, s_tlim, cfg.baby_epsilon,
            sort_rays=False, mesh_bounds=r.static.mesh_bounds,
            interpret=interpret, compute_uv=False, **flags,
        )
        return mh.t

    # visit statistics from the same plan machinery the walks consume
    n_pad = ((n + R - 1) // R) * R
    nb = n_pad // R
    ct = tables.tile_aabb.shape[0]
    pad = lambda v, f=0.0: jnp.pad(v, (0, n_pad - n), constant_values=f)
    o = jnp.stack([pad(s_paths.origin.x) - tables.center[0],
                   pad(s_paths.origin.y) - tables.center[1],
                   pad(s_paths.origin.z) - tables.center[2]], 1)
    d = jnp.stack([pad(s_paths.direction.x), pad(s_paths.direction.y),
                   pad(s_paths.direction.z)], 1)
    root = m.root_hit_mask(
        tables.tile_aabb, tables.center,
        s_paths.origin.x, s_paths.origin.y, s_paths.origin.z,
        s_paths.direction.x, s_paths.direction.y, s_paths.direction.z,
        s_tlim,
    )
    one = pad((s_paths.alive & root).astype(jnp.float32))
    _, _, cnt = m._build_tile_plan(
        tables.tile_aabb, o, d, one, pad(s_tlim, 3.4e38)
    )
    cnt = np.asarray(cnt)
    live_blocks = int((cnt > 0).sum())
    plan_visits = int(cnt.sum())
    # mono sweeps every tile of every live block; planned walks the plan
    visits = live_blocks * ct if mode == "mono" else plan_visits

    k = args.k
    def chain(x0):
        x = x0
        for _ in range(k):
            t = isect_sorted(x)
            x = x0 + 0.0 * t[0]
        return x

    x0 = s_paths.origin.x
    g = jax.jit(lambda x: x + 1.0)
    out = g(x0)
    device_sync(out)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = g(out)
        device_sync(out)
        reps.append(time.perf_counter() - t0)
    sync_ms = min(reps) * 1e3
    f = jax.jit(chain)
    out = f(x0)
    device_sync(out)
    t0 = time.perf_counter()
    out = f(x0)
    device_sync(out)
    ms = ((time.perf_counter() - t0) * 1e3 - sync_ms) / k

    sec = ms / 1e3
    mxu_flops = visits * 2.0 * R * m.NUM_F * 4 * T
    # HBM floor: ray features [n_pad, 16] f32 in + (t, tri) out; the 5k
    # feature table is VMEM-resident (loaded once per call)
    hbm_bytes = n_pad * (m.NUM_F + 2) * 4 + tables.features.nbytes
    vpu_slots = visits * 24.0 * R * T  # ~24 full-width epilogue ops/visit
    print(json.dumps({
        "mesh_scene": os.path.basename(args.scene),
        "traversal": mode,
        "kernel_ms_per_bounce": round(ms, 3),
        "visits": visits,
        "plan_visits": plan_visits,
        "live_blocks": live_blocks,
        "us_per_visit": round(ms * 1e3 / max(visits, 1), 3),
        "mxu_tflops": round(mxu_flops / sec / 1e12, 3),
        "mxu_peak_frac": round(mxu_flops / sec / 148e12, 4),
        "hbm_gbps": round(hbm_bytes / sec / 1e9, 2),
        "vpu_gelem_ops": round(vpu_slots / sec / 1e9, 1),
        "bound": "vpu-epilogue",
    }))


if __name__ == "__main__":
    main()
