"""Round-5 campaign 2: kernel-grid follow-ups after campaign 1.

Campaign 1 (same-session controls) landed mono as the 5k winner
(133.55 vs planned 141.98) and killed pixel-order (236.8/247.2 -- it
forfeits bounce tiers and adds an in-intersector scatter worth far more
than the 3.4 ms state permute it saves).  The remaining 5k lever from
the round-5 op-level profile is the ~1.2 us/BLOCK grid overhead
(mono matmul+min floor: 4.05 ms over 2500 blocks): RAY_TILE=512 halves
the grid.  RAY_TILE != 256 was a round-2 dead end for the PLANNED walk
(SMEM scalar-prefetch budget + per-block plan granularity); mono has no
plan and no SMEM rows, so the negative does not transfer -- measure it.

    python scripts/r5_campaign2.py [--spp 32 --batch 16]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

from bench_scenes import bench_scene  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    runs = [
        # (label, scene, cfg_kw, env)
        ("5k mono RAY_TILE=512", "scenes/cornell_mesh_5k.json",
         {}, {"PTT_RAY_TILE": "512"}),
        ("5k mono RAY_TILE=1024", "scenes/cornell_mesh_5k.json",
         {}, {"PTT_RAY_TILE": "1024"}),
        ("5k mono control (256)", "scenes/cornell_mesh_5k.json", {}, {}),
        ("textured RAY_TILE=512", "scenes/cornell_mesh_textured.json",
         {}, {"PTT_RAY_TILE": "512"}),
    ]

    results = []
    for label, path, kw, env in runs:
        if args.only and args.only not in label:
            continue
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            r = bench_scene(
                path, kw, spp=args.spp, batch=args.batch, cpu=args.cpu,
                timeout=3000,
            )
            r["label"] = label
            results.append(r)
            print(json.dumps(r), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"label": label, "error": str(e)[:300]}),
                  flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    print("== summary ==")
    for r in results:
        print(f"{r['label']:34s} {r.get('ms_per_frame', '?'):>8} ms/frame")


if __name__ == "__main__":
    main()
