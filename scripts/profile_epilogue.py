"""Op-level A/B of the planned-walk epilogue (VERDICT round-4 #1).

The 5k-mesh kernel spends ~7 us/visit while the visit's MXU matmul is
~0.24 us -- the cost is ~30 full-width [RAY_TILE, TRI_TILE] VPU ops of
Moller-Trumbore epilogue + winner bookkeeping.  This harness times kernel
VARIANTS on the production mid-bounce population (same plan, same sorted
state) to locate the microseconds and qualify contract-exact rewrites:

  prod_lanebest   the shipped _planned_kernel_lanebest (front-to-back plan)
  prod_planned    the shipped _planned_kernel (early exit + gate)
  lb_asc          lane-best over an ASCENDING-TILE-ID plan: ties resolve by
                  visit order (first win = lowest id), so the per-visit
                  update is strict-< only -- 3 ops vs 9.  Contract-exact.
  mono            NO plan at all: static Python unroll over every tile,
                  per-ray member windows per tile, strict-< lane-best,
                  one block-live skip.  Straight-line code (no fori/cond)
                  lets Mosaic pipeline tile c+1's matmul under tile c's
                  epilogue.  Contract-exact (ascending ids by construction).
  mono_gate       mono + per-tile any(member)-cond (plan-equivalent visit
                  set at zero plan cost, but conds break pipelining).
  lb_mm           walk with matmul + min fold only (per-visit floor probe;
                  WRONG results, timing only).
  mono_mm         mono with matmul + min fold only (floor probe).

lb_asc and mono outputs are asserted EQUAL to the production kernel's
(t, tri) on the captured population before timing.

    python scripts/profile_epilogue.py --scene scenes/cornell_mesh_5k.json
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/cornell_mesh_5k.json")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--only", default=None)
    ap.add_argument("--bounce0", action="store_true",
                    help="profile the camera-ray population instead")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    R, T, NF = m.RAY_TILE, m.TRI_TILE, m.NUM_F

    scene = set_resolution(load_scene(args.scene), args.res, args.res)
    cfg = RenderConfig(mesh_intersector="mxu", ray_sorting="off")
    r = Renderer(scene, cfg)
    n = r.static.pixel_count
    tables = r.dev.mxu_mesh
    interpret = jax.default_backend() == "cpu"
    ct = tables.tile_aabb.shape[0]
    print(
        f"{args.scene}: {r.static.num_triangles} tris, {ct} tiles, "
        f"{n} rays, backend={jax.default_backend()}",
        flush=True,
    )

    # --- population: camera rays (+ one bounce unless --bounce0) ---------
    @jax.jit
    def bounced(iteration):
        ikey = prng.iteration_key(r._base_key, iteration)
        cam_u = prng.uniforms(prng.stage_key(ikey, 0, 0), n, 4)
        paths = camera_ops.generate_camera_rays(
            r._cam_state, r.static.width, r.static.height,
            r.static.trace_depth, cam_u,
        )
        if args.bounce0:
            return paths
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

    # --- sorted, root-culled ray features (exactly _run's prologue) ------
    n_pad = ((n + R - 1) // R) * R
    nb = n_pad // R
    center = tables.center

    @jax.jit
    def build_rayf(ox, oy, oz, dx, dy, dz, alive, tl):
        root = m.root_hit_mask(
            tables.tile_aabb, center, ox, oy, oz, dx, dy, dz, tl
        )
        active = alive & root
        pad = lambda x, f=0.0: jnp.pad(x, (0, n_pad - n), constant_values=f)
        osx, osy, osz = (
            pad(ox) - center[0], pad(oy) - center[1], pad(oz) - center[2]
        )
        dxp, dyp, dzp = pad(dx), pad(dy), pad(dz)
        one = jnp.where(pad(active.astype(jnp.float32)) > 0, 1.0, 0.0)
        zero = jnp.zeros_like(one)
        rayf = jnp.stack(
            [
                dxp * one, dyp * one, dzp * one,
                (osy * dzp - osz * dyp) * one,
                (osz * dxp - osx * dzp) * one,
                (osx * dyp - osy * dxp) * one,
                osx * one, osy * one, osz * one,
                one, zero, zero, zero, zero, zero, zero,
            ],
            axis=1,
        )
        return rayf, pad(tl, 3.4e38)[:, None]

    rayf, tlim = build_rayf(
        s_paths.origin.x, s_paths.origin.y, s_paths.origin.z,
        s_paths.direction.x, s_paths.direction.y, s_paths.direction.z,
        s_paths.alive, s_tlim,
    )
    rayf = jnp.asarray(rayf)
    tlim = jnp.asarray(tlim)

    # --- plans ------------------------------------------------------------
    @jax.jit
    def plans(rayf, tlim):
        ids_ftb, tlo_ftb, cnt = m._plan_with_prefix(
            tables.tile_aabb, rayf, tlim
        )
        # ascending-tile-id plan: stable argsort of the miss mask keeps
        # candidate tiles in index order
        H = (
            tlo_ftb.reshape(nb, ct) < jnp.inf
        )  # membership, order-independent
        # rebuild candidacy per (block, tile) from the sorted plan: H above
        # is in sorted order; scatter back via ids
        Hb = jnp.zeros((nb, ct), jnp.bool_)
        Hb = Hb.at[
            jnp.arange(nb)[:, None], ids_ftb.reshape(nb, ct)
        ].set(H)
        ar = jnp.arange(ct, dtype=jnp.int32)[None, :]
        ids_asc = jnp.argsort(
            jnp.where(Hb, ar, ct + ar), axis=1
        ).astype(jnp.int32)
        return ids_ftb, tlo_ftb, cnt, ids_asc.reshape(-1)

    ids_ftb, tlo_ftb, cnt, ids_asc = (
        jnp.asarray(x) for x in plans(rayf, tlim)
    )
    cnt_np = np.asarray(cnt)
    live_blocks = int((cnt_np > 0).sum())
    visits = int(cnt_np.sum())
    live_rays = int(np.asarray(jnp.sum(rayf[:, 9] > 0)))
    print(
        f"plan: {visits} candidate visits over {live_blocks}/{nb} live "
        f"blocks ({live_rays} live rays); full sweep would be "
        f"{live_blocks * ct}",
        flush=True,
    )

    eps = cfg.baby_epsilon
    eps_succ = float(np.nextafter(np.float32(eps), np.float32(np.inf)))

    # --- variant kernels ---------------------------------------------------
    def mt_hit(rayf, feat_block, t_lo, t_hi):
        """The shared MT quad epilogue -> (hit, tt). Expression-identical
        to _walk_quad_epilogue (bit-identity; see that docstring)."""
        quad = jnp.dot(rayf, feat_block, preferred_element_type=jnp.float32)
        det = quad[:, 0 * T : 1 * T]
        u_num = quad[:, 1 * T : 2 * T]
        v_num = quad[:, 2 * T : 3 * T]
        t_num = quad[:, 3 * T : 4 * T]
        det_ok = jnp.abs(det) >= eps
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tt = t_num * inv_det
        s = jnp.where(det < 0.0, -1.0, 1.0)
        us = u_num * s
        vs = v_num * s
        da = det * s
        hit = (
            det_ok
            & (us >= 0.0)
            & (vs >= 0.0)
            & (us + vs <= da)
            & (tt >= t_lo)
            & (tt <= t_hi)
        )
        return hit, tt

    def resolve(lane_t, lane_tile, tlim, lane):
        row_min = jnp.min(lane_t, axis=1, keepdims=True)
        hitrow = row_min < tlim
        tri_lane = lane_tile * T + lane
        masked = jnp.where(
            lane_t <= row_min, tri_lane, jnp.int32(0x7FFFFFFF)
        )
        tri = jnp.min(masked, axis=1, keepdims=True)
        return (
            jnp.where(hitrow, row_min, tlim),
            jnp.where(hitrow, tri, -1),
        )

    def lb_asc_kernel(
        mm_only, ids_ref, cnt_ref, rayf_ref, tlim_ref, feat_ref, aabb_ref,
        out_t_ref, out_tri_ref,
    ):
        b = pl.program_id(0)
        rayf = rayf_ref[:]
        o = rayf[:, 6:9]
        dvec = rayf[:, 0:3]
        inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        tlim = tlim_ref[:]

        def body(t, carry):
            lane_t, lane_tile = carry
            tile_id = ids_ref[b * ct + t]
            cols = pl.ds(pl.multiple_of(tile_id * (4 * T), 4 * T), 4 * T)
            if mm_only:
                quad = jnp.dot(
                    rayf, feat_ref[:, cols],
                    preferred_element_type=jnp.float32,
                )
                return (
                    jnp.minimum(lane_t, quad[:, 0:T]),
                    lane_tile,
                )
            row = aabb_ref[pl.ds(tile_id, 1), :]
            member, s_tlo, s_thi = m._member_slab(row, o, inv, tlim)
            t_lo = jnp.where(member, jnp.maximum(s_tlo, eps_succ), jnp.inf)
            t_hi = jnp.where(member, s_thi, -jnp.inf)
            hit, tt = mt_hit(rayf, feat_ref[:, cols], t_lo, t_hi)
            cand = jnp.where(hit, tt, jnp.inf)
            upd = cand < lane_t
            return (
                jnp.where(upd, cand, lane_t),
                jnp.where(upd, tile_id, lane_tile),
            )

        lane_t, lane_tile = jax.lax.fori_loop(
            0, cnt_ref[b], body,
            (
                jnp.full((R, T), jnp.inf, jnp.float32),
                jnp.full((R, T), jnp.int32(1 << 30), jnp.int32),
            ),
        )
        out_t_ref[:], out_tri_ref[:] = resolve(lane_t, lane_tile, tlim, lane)

    def mono_kernel(
        flavor, rayf_ref, tlim_ref, feat_ref, aabb_ref, out_t_ref,
        out_tri_ref,
    ):
        rayf = rayf_ref[:]
        o = rayf[:, 6:9]
        dvec = rayf[:, 0:3]
        inv = 1.0 / jnp.where(dvec == 0.0, 1e-20, dvec)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        tlim = tlim_ref[:]
        live_col = rayf[:, 9:10] > 0.0

        @pl.when(jnp.any(live_col))
        def _():
            lane_t = jnp.full((R, T), jnp.inf, jnp.float32)
            lane_tile = jnp.full((R, T), jnp.int32(1 << 30), jnp.int32)
            for c in range(ct):
                row = aabb_ref[c : c + 1, :]
                member, s_tlo, s_thi = m._member_slab(row, o, inv, tlim)
                t_lo = jnp.where(
                    member, jnp.maximum(s_tlo, eps_succ), jnp.inf
                )
                t_hi = jnp.where(member, s_thi, -jnp.inf)

                def tile_eval(lane_t, lane_tile, t_lo=t_lo, t_hi=t_hi, c=c):
                    if flavor == "mm":
                        quad = jnp.dot(
                            rayf, feat_ref[:, c * 4 * T : (c + 1) * 4 * T],
                            preferred_element_type=jnp.float32,
                        )
                        return jnp.minimum(lane_t, quad[:, 0:T]), lane_tile
                    hit, tt = mt_hit(
                        rayf, feat_ref[:, c * 4 * T : (c + 1) * 4 * T],
                        t_lo, t_hi,
                    )
                    cand = jnp.where(hit, tt, jnp.inf)
                    upd = cand < lane_t
                    return (
                        jnp.where(upd, cand, lane_t),
                        jnp.where(upd, jnp.int32(c), lane_tile),
                    )

                if flavor == "gate":
                    lane_t, lane_tile = jax.lax.cond(
                        jnp.any(member & live_col),
                        lambda args, te=tile_eval: te(*args),
                        lambda args: args,
                        (lane_t, lane_tile),
                    )
                else:
                    lane_t, lane_tile = tile_eval(lane_t, lane_tile)
            out_t_ref[:], out_tri_ref[:] = resolve(
                lane_t, lane_tile, tlim, lane
            )

        @pl.when(jnp.logical_not(jnp.any(live_col)))
        def _():
            out_t_ref[:] = tlim_ref[:]
            out_tri_ref[:] = jnp.full((R, 1), -1, jnp.int32)

    feat = tables.features
    aabb = tables.tile_aabb
    grid = (nb,)
    out_shape = (
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
    )
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def call_planned(kern, nsp, *operands):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=grid,
            in_specs=[
                vm((R, NF), lambda i, *_: (i, 0)),
                vm((R, 1), lambda i, *_: (i, 0)),
                vm(feat.shape, lambda i, *_: (0, 0)),
                vm(aabb.shape, lambda i, *_: (0, 0)),
            ],
            out_specs=(
                vm((R, 1), lambda i, *_: (i, 0)),
                vm((R, 1), lambda i, *_: (i, 0)),
            ),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(*operands)

    def prod_lanebest(rf):
        return call_planned(
            functools.partial(m._planned_kernel_lanebest, eps, ct),
            3, ids_ftb, tlo_ftb, cnt, rf, tlim, feat, aabb,
        )

    def prod_planned(rf):
        return call_planned(
            functools.partial(m._planned_kernel, eps, ct),
            3, ids_ftb, tlo_ftb, cnt, rf, tlim, feat, aabb,
        )

    def lb_asc(rf):
        return call_planned(
            functools.partial(lb_asc_kernel, False),
            2, ids_asc, cnt, rf, tlim, feat, aabb,
        )

    def lb_mm(rf):
        return call_planned(
            functools.partial(lb_asc_kernel, True),
            2, ids_asc, cnt, rf, tlim, feat, aabb,
        )

    def mono_call(flavor):
        def f(rf):
            return pl.pallas_call(
                functools.partial(mono_kernel, flavor),
                grid=grid,
                in_specs=[
                    vm((R, NF), lambda i: (i, 0)),
                    vm((R, 1), lambda i: (i, 0)),
                    vm(feat.shape, lambda i: (0, 0)),
                    vm(aabb.shape, lambda i: (0, 0)),
                ],
                out_specs=(
                    vm((R, 1), lambda i: (i, 0)),
                    vm((R, 1), lambda i: (i, 0)),
                ),
                out_shape=out_shape,
                interpret=interpret,
            )(rf, tlim, feat, aabb)

        return f

    def prod_mono(rf):
        """The LANDED _mono_kernel (trimmed _mt_hit epilogue)."""
        return pl.pallas_call(
            functools.partial(m._mono_kernel, eps, ct),
            grid=grid,
            in_specs=[
                vm((R, NF), lambda i: (i, 0)),
                vm((R, 1), lambda i: (i, 0)),
                vm(feat.shape, lambda i: (0, 0)),
                vm(aabb.shape, lambda i: (0, 0)),
            ],
            out_specs=(
                vm((R, 1), lambda i: (i, 0)),
                vm((R, 1), lambda i: (i, 0)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(rf, tlim, feat, aabb)

    variants = [
        ("prod_lanebest", prod_lanebest, True),
        ("prod_planned", prod_planned, True),
        ("prod_mono", prod_mono, True),
        ("lb_asc", lb_asc, True),
        ("mono", mono_call("full"), True),
        ("mono_gate", mono_call("gate"), True),
        ("lb_mm", lb_mm, False),
        ("mono_mm", mono_call("mm"), False),
    ]

    # --- bit-identity gate on the exact variants ---------------------------
    ref_t, ref_tri = jax.jit(prod_lanebest)(rayf)
    ref_t, ref_tri = np.asarray(ref_t), np.asarray(ref_tri)
    print(f"reference hits: {(ref_tri >= 0).sum()}", flush=True)
    for name, fn, exact in variants[1:]:
        if not exact:
            continue
        if args.only and not any(s in name for s in args.only.split(",")):
            continue
        t, tri = jax.jit(fn)(rayf)
        t, tri = np.asarray(t), np.asarray(tri)
        same = (t == ref_t).all() and (tri == ref_tri).all()
        print(f"{name:18s} bit-identical: {same}", flush=True)
        if not same:
            bad = (t != ref_t) | (tri != ref_tri)
            idx = np.argwhere(bad[:, 0])[:5, 0]
            for i in idx:
                print(
                    f"  ray {i}: t {ref_t[i, 0]} vs {t[i, 0]}, "
                    f"tri {ref_tri[i, 0]} vs {tri[i, 0]}"
                )

    # --- timing ------------------------------------------------------------
    sync_ms = [None]

    def timed(name, fn, k=args.k):
        if args.only and not any(s in name for s in args.only.split(",")):
            return

        def chain(x0):
            x = x0
            for _ in range(k):
                t, tri = fn(x)
                x = x0 + 0.0 * t[0, 0]
            return x

        x0 = rayf
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
                print(
                    f"{'[sync calibration]':18s} {sync_ms[0]:8.2f} ms",
                    flush=True,
                )
            f = jax.jit(chain)
            out = f(x0)
            device_sync(out)
            t0 = time.perf_counter()
            out = f(x0)
            device_sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}  ERROR {str(e)[:160]}", flush=True)
            return
        ms = ((time.perf_counter() - t0) * 1e3 - sync_ms[0]) / k
        us_visit = ms * 1e3 / max(visits, 1)
        us_sweep = ms * 1e3 / max(live_blocks * ct, 1)
        print(
            f"{name:18s} {ms:8.2f} ms   {us_visit:6.2f} us/visit "
            f"({us_sweep:5.2f} us/sweep-visit)",
            flush=True,
        )

    for name, fn, _ in variants:
        timed(name, fn)


if __name__ == "__main__":
    main()
