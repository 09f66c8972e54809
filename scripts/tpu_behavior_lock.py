"""TPU absolute-behavior lock + material-sort permutation tripwire.

VERDICT round-4 #5/#6: the committed goldens (tests/goldens/*.npz) lock
absolute behavior on CPU only -- a backend/Mosaic change that shifts
TPU-only lowering (the fused shade epilogue, packed-bitcast gathers) would
pass the whole suite.  This script is the hardware-side lock, run as a
campaign step (and via tests/test_tpu_lock.py when PTT_TPU_TESTS=1):

1. GOLDENS LOCK: render every committed golden's (scene, res, spp, seed)
   on the live accelerator and compare against the committed CPU film.
   Tolerance only absorbs cross-backend fusion/re-association (measured
   ~1e-6 class); real regressions move many pixels by large amounts.

2. MATERIAL-SORT TRIPWIRE: the packed [N, 13] BITCAST row gather
   (ops/compaction._apply_permutation_isect) must equal 13 per-field
   gathers BIT-FOR-BIT on device.  It silently broke once from a
   backend-side change (PARITY.md round-3: 372 -> 663 ms and the packed
   fix); this pins the semantics, not just the speed.

Prints one JSON line per check and exits nonzero on any failure:

    python scripts/tpu_behavior_lock.py [--tol 1e-5] [--only NAME]
"""

import argparse
import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
GOLDEN_DIR = REPO / "tests" / "goldens"


def render_film(path, w, h, spp, np, seed=0):
    from project3_cuda_path_tracer_2025_tpu.config import RenderConfig
    from project3_cuda_path_tracer_2025_tpu.models import Renderer
    from project3_cuda_path_tracer_2025_tpu.scene import load_scene
    from project3_cuda_path_tracer_2025_tpu.scene.loader import set_resolution

    scene = set_resolution(load_scene(path), w, h)
    r = Renderer(scene, RenderConfig(), seed=seed)
    for _ in range(spp):
        r.step()
    film = r._flat_film()
    return np.stack(
        [np.asarray(film.x), np.asarray(film.y), np.asarray(film.z)], axis=1
    ).astype(np.float32)


def tripwire_material_sort(np, jnp, jax):
    """Packed-bitcast permutation apply == per-field gathers, ON DEVICE."""
    from project3_cuda_path_tracer_2025_tpu.ops.compaction import (
        _apply_permutation_isect,
    )
    from project3_cuda_path_tracer_2025_tpu.ops.intersect import Intersections
    from project3_cuda_path_tracer_2025_tpu.utils.vec import Vec3

    n = 65536
    rng = np.random.default_rng(0)

    def f32_plane():
        # exercise exact bit-pattern transport: normals, tiny/huge values,
        # denormals, negative zero, inf
        v = rng.standard_normal(n).astype(np.float32)
        v[:100] = np.float32(1e-42)  # denormal
        v[100:200] = np.float32(-0.0)
        v[200:300] = np.float32(np.inf)
        v[300:400] = np.float32(3.4e38)
        return jnp.asarray(v)

    isect = Intersections(
        t=f32_plane(),
        normal=Vec3(f32_plane(), f32_plane(), f32_plane()),
        uv_u=f32_plane(),
        uv_v=f32_plane(),
        dpdu=Vec3(f32_plane(), f32_plane(), f32_plane()),
        dpdv=Vec3(f32_plane(), f32_plane(), f32_plane()),
        material_id=jnp.asarray(rng.integers(0, 64, n, dtype=np.int32)),
        is_triangle=jnp.asarray(rng.integers(0, 2, n).astype(bool)),
    )
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    packed = jax.jit(_apply_permutation_isect)(isect, perm)

    def per_field(i, p):
        return jax.tree_util.tree_map(lambda a: a[p], i)

    ref = jax.jit(per_field)(isect, perm)

    bad = 0
    for name in ["t", "uv_u", "uv_v", "material_id", "is_triangle"]:
        a = np.asarray(getattr(packed, name))
        b = np.asarray(getattr(ref, name))
        bad += int((a.view(np.uint8) != b.view(np.uint8)).sum())
    for vec in ["normal", "dpdu", "dpdv"]:
        for ax in "xyz":
            a = np.asarray(getattr(getattr(packed, vec), ax))
            b = np.asarray(getattr(getattr(ref, vec), ax))
            bad += int((a.view(np.uint32) != b.view(np.uint32)).sum())
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-5,
                    help="max |TPU - CPU-golden| film tolerance")
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="self-check mode: run the lock on CPU (everything "
                    "must match at 0)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    failures = 0

    bad = tripwire_material_sort(np, jnp, jax)
    ok = bad == 0
    failures += not ok
    print(json.dumps({
        "check": "material_sort_packed_bitcast_tripwire",
        "backend": backend, "bad_bytes": bad, "ok": ok,
    }), flush=True)

    for gp in sorted(GOLDEN_DIR.glob("*.npz")):
        name = gp.stem
        if args.only and args.only not in name:
            continue
        g = np.load(gp)
        scene_path = str(g["scene"]).replace("$REPO", str(REPO))
        if not os.path.exists(scene_path):
            print(json.dumps({
                "check": f"golden:{name}", "backend": backend,
                "skipped": "scene missing",
            }), flush=True)
            continue
        w, h, spp = int(g["width"]), int(g["height"]), int(g["spp"])
        try:
            film = render_film(scene_path, w, h, spp, np)
        except Exception as e:  # noqa: BLE001 -- tunnel flakiness
            failures += 1
            print(json.dumps({
                "check": f"golden:{name}", "backend": backend,
                "error": str(e)[:200], "ok": False,
            }), flush=True)
            continue
        ref = g["film"]
        diff = np.abs(film - ref)
        ok = bool(diff.max() <= args.tol)
        failures += not ok
        print(json.dumps({
            "check": f"golden:{name}", "backend": backend,
            "max_abs": float(diff.max()),
            "rmse": float(np.sqrt((diff ** 2).mean())),
            "bitexact_frac": float((diff == 0).mean()),
            "tol": args.tol, "ok": ok,
        }), flush=True)

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
