"""Test configuration: force an 8-device virtual CPU platform before JAX loads.

SURVEY.md section 4: multi-chip collective code paths are tested on CPU with
``--xla_force_host_platform_device_count=8`` (the reference has no distributed
tests at all; this is our stand-in for pod hardware)."""

import os

# PMC_TESTS_TPU=1 runs the suite against the real TPU backend instead of the
# virtual CPU mesh (used for tests/test_pallas_tpu.py, which skips on CPU)
_TPU_MODE = bool(os.environ.get("PMC_TESTS_TPU"))

os.environ.setdefault("JAX_PLATFORMS", "axon" if _TPU_MODE else "cpu")
# this jax build's axon plugin ignores JAX_PLATFORMS; PLATFORM_NAME works
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent jit cache: the suite is compile-dominated on CPU; cache across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pmc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin initializes its (tunnel-backed) backend even for
# CPU-selected runs when only the env vars are set; the config route
# restricts backend initialization to cpu, keeping tests hermetic.
import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
# the env-var route doesn't reliably reach jax here; set the config directly
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# Long single-process suite runs accumulate thousands of loaded XLA CPU
# executables; late compilations have been observed to segfault inside
# backend_compile_and_load once enough state piles up (1-CPU CI box,
# ~230 tests in). Dropping jit caches between modules keeps the executable
# population bounded; the persistent disk cache above makes the resulting
# recompiles cheap deserializes.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    """Default run excludes @pytest.mark.slow (long-statistics tests) so the
    virtual-mesh suite stays under ~10 min; the FULL suite (round captures,
    release checks) runs with PMC_TESTS_FULL=1 or an explicit -m filter."""
    if os.environ.get("PMC_TESTS_FULL") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow: run with PMC_TESTS_FULL=1 or -m slow"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
