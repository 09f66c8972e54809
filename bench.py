"""Headline benchmark: cornell.json 800x800 depth-8 ms/frame on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline: the reference's closest published proxy for cornell-class scenes is
42.204 ms/frame (diffuse scene with stream compaction on an RTX 3060 Laptop,
reference README.md:133-136; see BASELINE.md).  ``vs_baseline`` is the
speedup factor baseline_ms / our_ms (>1 = faster than the reference).

Extra context fields (mrays/s, spp measured, device) are included in the same
line; the driver reads metric/value/unit/vs_baseline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 42.204  # reference README.md:133-136
SCENE = "/root/reference/scenes/cornell.json"


def _probe_backend(timeout_s: int = 300) -> str | None:
    """Fail fast when the TPU tunnel is down: a dead relay makes
    jax.devices() hang INDEFINITELY in-process (no error), which would hang
    the whole benchmark run.  Probe in a bounded subprocess instead."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return f"backend probe timed out after {timeout_s}s (tunnel down?)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return tail[-1][:300] if tail else "backend probe failed"
    return None


def main():
    err = _probe_backend()
    if err is not None:
        print(json.dumps({
            "metric": "cornell.json 800x800 depth-8 ms/frame",
            "value": None, "unit": "ms/frame", "vs_baseline": None,
            "error": err,
        }))
        return 1

    import jax

    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer

    spp_per_launch = int(os.environ.get("BENCH_BATCH", "64"))
    warmup = int(os.environ.get("BENCH_WARMUP", "2"))
    reps = int(os.environ.get("BENCH_REPS", "4"))

    cfg = RenderConfig(spp_per_launch=spp_per_launch)
    r = Renderer(SCENE, cfg)

    # Warmup: compile both the single-step and batched programs.
    # (step_many AOT-compiles and device-syncs; block_until_ready is a no-op
    # on the tunneled backend, so all timing below relies on device_sync's
    # scalar fetch.)
    for _ in range(warmup):
        r.step_many(spp_per_launch)

    t0 = time.perf_counter()
    for i in range(reps):
        r.step_many(spp_per_launch, sync=(i == reps - 1))
    dt = time.perf_counter() - t0
    frames = reps * spp_per_launch
    ms_per_frame = dt * 1e3 / frames

    rays_per_frame = float(r._alive_counts.sum() + r.static.pixel_count)
    mrays = rays_per_frame / (ms_per_frame * 1e3)

    # Device-compute ms/frame via a two-point chained-K control: time ONE
    # dispatch+sync at K and at 2K; the difference cancels the fixed
    # dispatch + tunnel-sync latency exactly, leaving pure device compute
    # per frame (VERDICT round-2 asked for this next to the amortized and
    # unbatched numbers).
    k1, k2 = spp_per_launch, 2 * spp_per_launch
    r.step_many(k2)  # compile the 2K program outside the timed window
    t1 = time.perf_counter()
    r.step_many(k1)
    t1 = time.perf_counter() - t1
    t2 = time.perf_counter()
    r.step_many(k2)
    t2 = time.perf_counter() - t2
    device_compute_ms = max(0.0, (t2 - t1) * 1e3 / (k2 - k1))
    dispatch_overhead_ms = max(0.0, t1 * 1e3 - k1 * device_compute_ms)

    # Unbatched 1-spp dispatch, two operating points (VERDICT round-3 #3):
    #   * PIPELINED: dispatches enqueue back-to-back, one sync at the end --
    #     the steady-state frame rate of an interactive loop whose display
    #     fetch is the sync point (interactive.py runs exactly this way).
    #   * SYNC: per-frame device sync -- the worst-case latency incl. the
    #     ~22 ms tunnel roundtrip (a co-located host would not pay it).
    from project3_cuda_path_tracer_2025_tpu.utils.timers import FrameStats, device_sync

    r.step()  # compile the single-step program outside the timed window
    n_pipe = 32
    t3 = time.perf_counter()
    for _ in range(n_pipe):
        r.step(sync=False)
    device_sync(r.film.x)
    unbatched_ms = (time.perf_counter() - t3) * 1e3 / n_pipe
    r.stats = FrameStats()
    for _ in range(8):
        r.step()
    unbatched_sync_ms = r.stats.mean_ms

    img = r.image_normalized()
    import numpy as np

    finite = bool(np.isfinite(img).all())

    # Mesh traversal-kernel roofline (VERDICT round-4 #10): achieved MXU
    # FLOP/s + HBM GB/s + VPU elem-op rate for the production kernel on the
    # 5k mesh, so the "epilogue-bound" analysis carries hardware numbers in
    # every round's BENCH json.  Bounded subprocess: a fault or slow tunnel
    # degrades to an error note, never the headline.
    roofline = None
    if os.environ.get("BENCH_MESH", "1") == "1":
        import subprocess

        try:
            rr = subprocess.run(
                [sys.executable, "scripts/roofline_mesh.py"],
                capture_output=True, text=True, timeout=2400,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in rr.stdout.splitlines():
                if line.startswith("{"):
                    roofline = json.loads(line)
        except Exception as e:  # noqa: BLE001
            roofline = {"error": str(e)[:200]}
        if roofline is None:
            tail = (rr.stderr or rr.stdout).strip().splitlines()
            roofline = {"error": tail[-1][:200] if tail else "no output"}

    print(
        json.dumps(
            {
                "metric": "cornell.json 800x800 depth-8 ms/frame",
                "value": round(ms_per_frame, 3),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINE_MS / ms_per_frame, 3),
                "baseline_ms": BASELINE_MS,
                "mrays_per_s": round(mrays, 1),
                "frames_timed": frames,
                "spp_per_launch": spp_per_launch,
                "unbatched_ms_per_frame": round(unbatched_ms, 3),
                "unbatched_sync_ms_per_frame": round(unbatched_sync_ms, 3),
                "device_compute_ms_per_frame": round(device_compute_ms, 3),
                "dispatch_overhead_ms": round(dispatch_overhead_ms, 3),
                "film_finite": finite,
                "device": str(jax.devices()[0]),
                **({"mesh_roofline": roofline} if roofline else {}),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
