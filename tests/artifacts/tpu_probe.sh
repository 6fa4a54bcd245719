#!/bin/sh
# Background probe for the axon TPU tunnel (down since late round 3).
# Retries a minimal device query every 120 s; the moment it succeeds, fires
# the round-4 evidence capture (capture_round4.sh) exactly once and exits.
#   nohup sh tests/artifacts/tpu_probe.sh &
cd "$(dirname "$0")/../.." || exit 1
LOG=/tmp/tpu_probe.log
: > "$LOG"
while :; do
  date -u +"[%Y-%m-%dT%H:%M:%SZ] probing" >> "$LOG"
  if timeout 120 python -c "import jax; d = jax.devices(); assert d and d[0].platform == 'tpu', d; print(d)" >> "$LOG" 2>&1; then
    date -u +"[%Y-%m-%dT%H:%M:%SZ] TPU ALIVE — firing capture_round4.sh" >> "$LOG"
    sh tests/artifacts/capture_round4.sh >> "$LOG" 2>&1
    date -u +"[%Y-%m-%dT%H:%M:%SZ] capture done rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 120
done
