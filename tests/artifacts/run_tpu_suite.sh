#!/bin/sh
# Captures the on-TPU Pallas test run (VERDICT round-2 item 8): the 9
# hardware-gated kernel tests plus the seed-contract tests, against the real
# chip. Usage: sh tests/artifacts/run_tpu_suite.sh
cd "$(dirname "$0")/../.." || exit 1
OUT=tests/artifacts/tpu_pallas_r3.log
{
  date -u +"captured: %Y-%m-%dT%H:%M:%SZ"
  python - <<'PY'
import jax
print("jax:", jax.__version__)
d = jax.devices()[0]
print("device:", d.platform, getattr(d, "device_kind", "?"))
PY
  PMC_TESTS_TPU=1 python -m pytest tests/test_pallas_tpu.py -q -rs 2>&1
} | tee "$OUT"
