"""Test configuration: force an 8-device virtual CPU platform before JAX loads.

SURVEY.md section 4: multi-chip collective code paths are tested on CPU with
``--xla_force_host_platform_device_count=8`` (the reference has no distributed
tests at all; this is our stand-in for pod hardware)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
