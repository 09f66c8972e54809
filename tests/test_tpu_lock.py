"""Hardware-side absolute-behavior lock (VERDICT round-4 #5/#6).

The CPU goldens can't see TPU-only lowering (the fused shade epilogue,
Mosaic kernels, packed-bitcast gathers).  ``scripts/tpu_behavior_lock.py``
renders every committed golden on the live accelerator and runs the
material-sort packed-permutation tripwire; this wrapper runs it from
pytest when real hardware is opted in (the suite's conftest forces CPU, so
the script runs in a clean subprocess).

Opt-in: PTT_TPU_TESTS=1 pytest tests/test_tpu_lock.py  (TPU, minutes of
tunnel compiles).  The CPU self-check below always runs: on the goldens'
own backend everything must match bit-for-bit, which validates the lock
machinery itself (a broken comparator would otherwise only fail on TPU).
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "tpu_behavior_lock.py"


def _run(extra, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(
        [sys.executable, str(SCRIPT), *extra],
        capture_output=True, text=True, env=e, cwd=str(REPO), timeout=3000,
    )


def test_lock_cpu_selfcheck():
    """On CPU the lock must pass at tolerance 0 (same backend as the
    goldens) -- proves the comparator catches any drift at all."""
    # subset: one golden keeps the one-core runtime reasonable; the
    # tripwire always runs
    r = _run(["--cpu", "--tol", "0", "--only", "cornell"])
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.tpu
@pytest.mark.skipif(
    os.environ.get("PTT_TPU_TESTS") != "1",
    reason="TPU hardware lock is opt-in: PTT_TPU_TESTS=1",
)
def test_lock_tpu():
    env = {k: v for k, v in os.environ.items()}
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick the TPU
    r = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=6000,
    )
    assert r.returncode == 0, r.stdout + r.stderr
