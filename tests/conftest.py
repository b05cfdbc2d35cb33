"""Test config: force an 8-virtual-device CPU platform before JAX import.

This is the fake-backend capability the reference lacked (SURVEY.md §4):
multi-chip sharding logic is exercised on a host-platform device mesh.

``CMRTPU_TEST_BACKEND=tpu`` skips the CPU pin so hardware-gated tests (the
Pallas-kernel parity checks in tests/test_pallas.py) run on the real chip:

    CMRTPU_TEST_BACKEND=tpu pytest tests/test_pallas.py

Only single-chip-safe files should be run this way — the suite's mesh tests
assume the 8-device virtual CPU platform.
"""

import os

_ON_HW = os.environ.get("CMRTPU_TEST_BACKEND", "").lower() in ("tpu", "axon")
if not _ON_HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _ON_HW and "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if not _ON_HW and "xla_backend_optimization_level" not in flags:
    # tests are compile-bound, not run-bound: opt level 0 compiles the big
    # fused train steps ~3x faster with identical numerics assertions
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

# the container's sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; pin the platform again through the config API
if not _ON_HW:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The persistent XLA compilation cache defaults OFF on the cpu backend
# (XLA:CPU AOT reuse is host-CPU-feature-sensitive; see
# cmrtpu/utils/xla_cache.py). The suite runs on ONE trusted host, where the
# warm cache cuts the run from ~20 min to ~8 — opt in explicitly with the
# fingerprint-scoped default dir.
if "CMRTPU_COMPILATION_CACHE_DIR" not in os.environ:
    from cmrtpu.utils.xla_cache import _default_dir

    os.environ["CMRTPU_COMPILATION_CACHE_DIR"] = os.path.expanduser(
        _default_dir())


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def synthetic_slice(rng):
    """A SAX-like 2D slice + RVIP mask pair (values {0,1,2})."""
    h, w = 96, 104
    img = rng.normal(400.0, 120.0, size=(h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img += 300.0 * np.exp(-(((yy - 48) ** 2 + (xx - 52) ** 2) / (2 * 18.0 ** 2)))
    msk = np.zeros((h, w), dtype=np.uint8)
    msk[30:33, 40:43] = 1   # anterior IP blob
    msk[62:65, 38:41] = 2   # inferior IP blob
    return img, msk
