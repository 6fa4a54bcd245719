#!/bin/sh
# Round-4 TPU evidence capture (VERDICT round-3 item 1): run once the axon
# tunnel is reachable. Sequential — the chip is shared-tenancy and one
# workload at a time measures cleanest. Each stage appends to the log; the
# pytest artifact goes through run_tpu_suite.sh (only a PASSING run is kept).
#   sh tests/artifacts/capture_round4.sh
cd "$(dirname "$0")/../.." || exit 1
# benches import the package from the repo root (no editable install in this image)
PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
LOG=tests/artifacts/capture_round4.log
# Append with a per-run header (never truncate): the committed log is a
# round-4 evidence artifact and must survive re-runs (ADVICE round-4 item 2).
date -u +"===== capture run started %Y-%m-%dT%H:%M:%SZ =====" >> "$LOG"
stamp() { date -u +"[%Y-%m-%dT%H:%M:%SZ] $1" >> "$LOG"; }

stamp "bench.py (headline 1024^2 Metropolis)"
timeout 3600 python bench.py >> "$LOG" 2>&1
stamp "bench.py rc=$?"

stamp "on-chip pytest artifact (run_tpu_suite.sh)"
sh tests/artifacts/run_tpu_suite.sh >> "$LOG" 2>&1
stamp "suite rc=$?"

stamp "hard-terms QmcRunner (group-major matmul engine, auto-gated)"
timeout 3600 python benches/bench_qmcrunner_hard.py >> "$LOG" 2>&1
stamp "hard rc=$?"

stamp "hard-terms QmcRunner at n=128 R=256 (gm engine)"
timeout 3600 env PMC_BENCH_N=128 PMC_BENCH_R=256 python benches/bench_qmcrunner_hard.py >> "$LOG" 2>&1
stamp "hard-128 rc=$?"

stamp "hard-terms QmcRunner control (classic select-chain path, PMC_GENERIC_GM=0)"
timeout 3600 env PMC_GENERIC_GM=0 python benches/bench_qmcrunner_hard.py >> "$LOG" 2>&1
stamp "hard-classic rc=$?"

stamp "classical move families (post int8/edge-matmul; incl n=16384 ELL + default step)"
timeout 3600 python benches/bench_classical_graph.py >> "$LOG" 2>&1
stamp "classical rc=$?"

stamp "tempering swap throughput"
timeout 3600 python benches/bench_tempering.py >> "$LOG" 2>&1
stamp "tempering rc=$?"

stamp "driver configs (annealing + autocorrelation incl. on-device bond reduction)"
timeout 3600 python benches/bench_configs.py >> "$LOG" 2>&1
stamp "configs rc=$?"

stamp "generic engine baseline chain"
timeout 3600 python benches/bench_qmcrunner.py >> "$LOG" 2>&1
stamp "qmcrunner rc=$?"

stamp "done"
tail -5 "$LOG"
