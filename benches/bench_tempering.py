"""Parallel-tempering swap-throughput benchmark (BASELINE.json config:
"+-J spin glass, 64 replicas across a beta ladder").

Prints one JSON line: replica-swap attempts/sec through the full
LatticeTempering API (sweeps + swap phases + sampling), plus the accepted-swap
rate. The reference's swap step is a single-threaded pass between rayon bursts
(tempering.rs:177-212); here all pairs evaluate in one vectorized log-weight
comparison on device.
"""

import json
import os
import time

import numpy as np

from pyisingmontecarlo_tpu import LatticeTempering
from pyisingmontecarlo_tpu.graph import grid_2d_edges


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _enable_cache()
    smoke = bool(os.environ.get("PMC_BENCH_SMOKE"))
    L = 4 if smoke else 12  # 144-spin +-J spin glass
    rng = np.random.default_rng(0)
    edges = [
        ((a, b), float(rng.choice([-1.0, 1.0])))
        for (a, b), _ in grid_2d_edges(L, L)
    ]
    lt = LatticeTempering(edges, seed=0)
    nrep = 6 if smoke else 64
    for b in np.geomspace(0.2, 3.0, nrep):
        lt.add_graph(1.0, 0.0, float(b))

    # slope timing between two sweep counts (floor-immune; see
    # bench_classical_graph.py)
    t_lo, t_hi = (4, 8) if smoke else (500, 2000)
    lt.qmc_timesteps_sample(t_lo, replica_swap_freq=1)  # compile + warm
    lt.qmc_timesteps_sample(t_hi, replica_swap_freq=1)
    ts = {t_lo: [], t_hi: []}
    for t in (t_lo, t_hi, t_lo, t_hi):
        t0 = time.perf_counter()
        lt.qmc_timesteps_sample(t, replica_swap_freq=1)
        ts[t].append(time.perf_counter() - t0)
    dt = min(ts[t_hi]) - min(ts[t_lo])
    sweeps = t_hi - t_lo
    # one swap phase per sweep; (nrep-1)/2 eligible pairs per phase
    attempts = sweeps * (nrep - 1) / 2
    print(
        json.dumps(
            {
                "metric": "pt_replica_swap_attempts_per_sec_64rep_pmJ_glass",
                "value": round(attempts / dt, 1),
                "unit": "swap-attempts/s",
                "accepted_swaps": lt.get_total_swaps(),
                "sweeps_per_sec": round(sweeps / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
