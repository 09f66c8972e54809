"""Round-5 campaign 1: pinned same-session controls (VERDICT #2/#3).

One process, one backend session-class, fixed order -- so every A/B pair
in the table is same-session and "backend drift" is excluded from the
ledger:

  * 200k: auto(binned) vs streamed control vs each +plan_impl=pallas
  * 500k: streamed default vs plan_impl=pallas  (489 tiles -- where the
    O(N*Ct) XLA plan sweep should hurt most)
  * 5k:   default vs plan_impl=pallas (5 tiles -- should be neutral)
  * 80k:  streamed vs plan_impl=pallas

    python scripts/r5_campaign1.py [--spp 32 --batch 16]
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
        # --- round-5 kernel/bounce decisions, 5k class -------------------
        ("5k auto(mono)", "scenes/cornell_mesh_5k.json", {}, {}),
        ("5k planned control", "scenes/cornell_mesh_5k.json",
         {"mxu_traversal": "planned"}, {}),
        ("5k mono+pixel-order", "scenes/cornell_mesh_5k.json",
         {"mesh_state_order": "pixel"}, {}),
        ("5k planned+pixel-order", "scenes/cornell_mesh_5k.json",
         {"mxu_traversal": "planned", "mesh_state_order": "pixel"}, {}),
        ("20k default", "scenes/cornell_mesh_20k.json", {}, {}),
        ("20k pixel-order", "scenes/cornell_mesh_20k.json",
         {"mesh_state_order": "pixel"}, {}),
        ("20k mono-forced", "scenes/cornell_mesh_20k.json",
         {"mxu_traversal": "mono"}, {"PTT_MONO_MAX_TILES": "20"}),
        ("textured default", "scenes/cornell_mesh_textured.json", {}, {}),
        # --- 500k: super-tile streamed walk A/B --------------------------
        ("500k super(auto-on)", "scenes/cornell_mesh_500k.json", {}, {}),
        ("500k streamed control", "scenes/cornell_mesh_500k.json",
         {}, {"PTT_STREAM_SUPER": "0"}),
        ("500k super+pallas-plan", "scenes/cornell_mesh_500k.json",
         {}, {"PTT_PLAN_IMPL": "pallas"}),
        ("500k super+pixel-order", "scenes/cornell_mesh_500k.json",
         {"mesh_state_order": "pixel"}, {}),
        ("200k auto(binned) xla-plan", "scenes/cornell_mesh_200k.json", {}, {}),
        ("200k streamed xla-plan", "scenes/cornell_mesh_200k.json",
         {"mxu_traversal": "streamed"}, {}),
        ("200k auto(binned) pallas-plan", "scenes/cornell_mesh_200k.json",
         {}, {"PTT_PLAN_IMPL": "pallas"}),
        ("200k streamed pallas-plan", "scenes/cornell_mesh_200k.json",
         {"mxu_traversal": "streamed"}, {"PTT_PLAN_IMPL": "pallas"}),
        ("500k nosuper pallas-plan", "scenes/cornell_mesh_500k.json",
         {}, {"PTT_STREAM_SUPER": "0", "PTT_PLAN_IMPL": "pallas"}),
        ("80k streamed xla-plan", "scenes/cornell_mesh_80k.json", {}, {}),
        ("80k streamed pallas-plan", "scenes/cornell_mesh_80k.json",
         {}, {"PTT_PLAN_IMPL": "pallas"}),
        ("5k default xla-plan", "scenes/cornell_mesh_5k.json", {}, {}),
        ("5k default pallas-plan", "scenes/cornell_mesh_5k.json",
         {}, {"PTT_PLAN_IMPL": "pallas"}),
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
