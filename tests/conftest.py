"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; we validate sharding and
collectives on a faked 8-device CPU platform (SURVEY.md §4 item (d)).  This
must run before jax initializes, hence env vars at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent compile cache may hold CPU AOT artifacts compiled on a
# machine with different vector features (the TPU host); loading them here
# changes float rounding run-to-run and flakes borderline ATE assertions.
# Tests always compile locally.
os.environ.setdefault("SLAM_TPU_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# NB: this environment pre-imports jax (axon sitecustomize) with
# JAX_PLATFORMS=axon, so env vars alone are too late — force via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _shed_compiled_programs():
    """Drop jax's in-process compiled-executable caches between test modules.

    jax-on-CPU keeps every compiled executable's LLVM-JIT code sections
    mmap'd for the life of the process; a full-suite run compiles enough
    programs to exhaust the kernel's default vm.max_map_count (65530), at
    which point LLVM's allocator fails mid-compile ("LLVM compilation
    error: Cannot allocate memory") and XLA segfaults/aborts.  Modules
    rarely share shapes, so shedding at module boundaries costs little
    recompilation and keeps the map count bounded by the largest single
    module instead of the whole session."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def scene():
    from slam_indoor_code_tpu.testing import make_scene

    return make_scene(n_points=500, n_frames=10, seed=3)


@pytest.fixture()
def rng():
    # Function-scoped: every test draws the SAME stream from seed 42, so a
    # test's random inputs never depend on which tests ran before it (green
    # means green under any pytest selection).
    return np.random.default_rng(42)
