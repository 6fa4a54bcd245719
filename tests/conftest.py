"""Test configuration: force an 8-device virtual CPU platform before JAX loads.

SURVEY.md section 4: multi-chip collective code paths are tested on CPU with
``--xla_force_host_platform_device_count=8`` (the reference has no distributed
tests at all; this is our stand-in for pod hardware)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent jit cache: the suite is compile-dominated on CPU; cache across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pmc")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
