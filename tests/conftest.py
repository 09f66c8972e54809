"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and keep JAX in float32."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax

# The container's sitecustomize force-registers the axon (TPU tunnel) backend
# and overrides JAX_PLATFORMS; undo that so tests run on 8 virtual CPUs.
jax.config.update("jax_platforms", "cpu")

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")
SCENES_DIR = REFERENCE_ROOT / "scenes"


@pytest.fixture(scope="session")
def repo_root():
    return REPO_ROOT


@pytest.fixture(scope="session")
def scenes_dir():
    if not SCENES_DIR.is_dir():
        pytest.skip("reference scenes not available")
    return SCENES_DIR


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.is_dir():
        pytest.skip("reference repo not available")
    return REFERENCE_ROOT
