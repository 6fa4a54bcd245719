#!/bin/sh
# Round-5 TPU evidence capture. Usage:
#   sh tests/artifacts/capture_round5.sh          # real capture (TPU via axon)
#   sh tests/artifacts/capture_round5.sh smoke    # CPU tiny-shape smoke run
#
# The smoke mode runs the IDENTICAL stage list with JAX_PLATFORMS=cpu and
# PMC_BENCH_SMOKE=1 (every bench shrinks its shapes/sweeps) and exits nonzero
# if any stage fails — run it BEFORE spending a chip window (VERDICT round-4
# item 8: a PYTHONPATH-class bug must never again burn tunnel time).
# The real capture appends to the committed log with a per-run header (never
# truncates committed evidence; ADVICE round-4 item 2).
cd "$(dirname "$0")/../.." || exit 1
PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH

MODE="${1:-tpu}"
if [ "$MODE" = "smoke" ]; then
    JAX_PLATFORMS=cpu; export JAX_PLATFORMS
    # this jax build's axon plugin ignores JAX_PLATFORMS; PLATFORM_NAME is
    # what actually keeps backend selection on CPU (same note in
    # tests/conftest.py)
    JAX_PLATFORM_NAME=cpu; export JAX_PLATFORM_NAME
    PMC_BENCH_SMOKE=1; export PMC_BENCH_SMOKE
    PMC_BENCH_ALLOW_CPU=1; export PMC_BENCH_ALLOW_CPU
    LOG="${PMC_SMOKE_LOG:-/tmp/capture_round5_smoke.log}"
    : > "$LOG"
    TMO=900
else
    LOG=tests/artifacts/capture_round5.log
    TMO=3600
fi
date -u +"===== capture run ($MODE) started %Y-%m-%dT%H:%M:%SZ =====" >> "$LOG"
FAILED=0

stamp() { date -u +"[%Y-%m-%dT%H:%M:%SZ] $1" >> "$LOG"; }
stage() {
    # stage <name> <cmd...>
    NAME="$1"; shift
    stamp "$NAME"
    timeout "$TMO" "$@" >> "$LOG" 2>&1
    RC=$?
    stamp "$NAME rc=$RC"
    if [ "$RC" -ne 0 ]; then FAILED=1; fi
}

stage "bench.py (headline 1024^2 Metropolis)" python bench.py
if [ "$MODE" != "smoke" ]; then
    # on-chip pytest artifact: TPU-gated tests, meaningless on CPU (the CPU
    # suite already runs them through the virtual mesh in tests/)
    stage "on-chip pytest artifact (run_tpu_suite.sh)" sh tests/artifacts/run_tpu_suite.sh
fi
stage "hard-terms QmcRunner (gm engine, auto-gated)" python benches/bench_qmcrunner_hard.py
# the big-shape stage still exercises the env-override path in smoke mode,
# but at a CPU-feasible shape (the full n=128/R=256 plane is a TPU workload)
if [ "$MODE" = "smoke" ]; then
    stage "hard-terms QmcRunner n=128 R=256 (gm engine)" env PMC_BENCH_N=16 PMC_BENCH_R=8 python benches/bench_qmcrunner_hard.py
else
    stage "hard-terms QmcRunner n=128 R=256 (gm engine)" env PMC_BENCH_N=128 PMC_BENCH_R=256 python benches/bench_qmcrunner_hard.py
fi
stage "hard-terms QmcRunner control (classic path)" env PMC_GENERIC_GM=0 python benches/bench_qmcrunner_hard.py
stage "gm/classic crossover (matched shapes straddling PMC_GM_MAX)" python benches/bench_gm_crossover.py
stage "classical move families" python benches/bench_classical_graph.py
# edge-move A/B in ONE session (same tenancy): round-4 measured the reworked
# edge at 719.9us vs round 3's 415us — regression or noise? (VERDICT item 4)
# (settled 2026-08-19: ON=717.3us, OFF=656.3us same session -> per-class
# matmuls are now the default and PMC_EDGE_B0=1 opts INTO the rework)
stage "edge A/B: one-read-per-sweep ON" env PMC_BENCH_FAMS=edge PMC_EDGE_B0=1 python benches/bench_classical_graph.py
stage "edge A/B: one-read-per-sweep OFF" env PMC_BENCH_FAMS=edge python benches/bench_classical_graph.py
stage "tempering swap throughput" python benches/bench_tempering.py
stage "driver configs (annealing + autocorrelation)" python benches/bench_configs.py
stage "generic engine baseline chain" python benches/bench_qmcrunner.py

stamp "done (failed=$FAILED)"
if [ "$MODE" = "smoke" ]; then
    cat "$LOG"
fi
exit "$FAILED"
