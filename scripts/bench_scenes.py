"""Benchmark a set of scenes on the current backend; prints a table + JSON.

Covers the reference's benchmark matrix (BASELINE.md): cornell-class
diffuse, mesh+BVH (and optional brute-force A/B), material sorting A/B.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench_scene(path, cfg_kw, spp=32, batch=16, res=None):
    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene, set_resolution

    scene = load_scene(path)
    if res:
        set_resolution(scene, res, res)
    cfg = RenderConfig(spp_per_launch=batch, **cfg_kw)
    r = Renderer(scene, cfg)
    r.step_many(batch)  # compile + warmup
    t0 = time.perf_counter()
    done = batch
    while done < spp + batch:
        r.step_many(batch)
        done += batch
    dt = time.perf_counter() - t0
    frames = done - batch
    ms = dt * 1e3 / frames
    rays = float(r._alive_counts.sum() + r.static.pixel_count)
    import numpy as np

    finite = bool(np.isfinite(r.image()).all())
    return dict(
        scene=path.split("/")[-1],
        tris=r.static.num_triangles,
        ms_per_frame=round(ms, 2),
        mrays_per_s=round(rays / (ms * 1e3), 1),
        finite=finite,
        **{k: v for k, v in cfg_kw.items()},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--quick", action="store_true", help="skip brute-force A/B")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    runs = [
        ("/root/reference/scenes/cornell.json", {}),
        ("scenes/cornell_mesh_5k.json", {}),
        ("scenes/cornell_mesh_20k.json", {}),
        ("scenes/cornell_mesh_80k.json", {}),
    ]
    if not args.quick:
        runs.append(("scenes/cornell_mesh_5k.json", {"bvh_acceleration": False}))
        runs.append(("/root/reference/scenes/cornell.json", {"integrator": "wavefront"}))
        runs.append(
            (
                "/root/reference/scenes/cornell.json",
                {"integrator": "wavefront", "material_sorting": True},
            )
        )

    results = []
    for path, kw in runs:
        try:
            r = bench_scene(path, kw, spp=args.spp, batch=args.batch)
            results.append(r)
            print(json.dumps(r), flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"scene": path, "error": str(e)[:300]}), flush=True)

    print("== summary ==")
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
