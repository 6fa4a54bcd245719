"""Generic k-local (QmcRunner) worldline throughput benchmark.

Prints one JSON line: site-sub-slice updates/sec for a 64-site TFIM chain
expressed as generic interactions (diagonal ZZ bonds + 1-local transverse
terms), 64 replicas, through the public QmcRunner API — the reference's
``qmc::sse::Qmc`` surface (qmcrunner.rs:161-201 sampling contract).
"""

import json
import os
import time

import numpy as np

from pyisingmontecarlo_tpu import QmcRunner


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _enable_cache()
    smoke = bool(os.environ.get("PMC_BENCH_SMOKE"))
    n, replicas, beta, gamma = 64, 64, 1.0, 1.0
    if smoke:
        n, replicas = 8, 4
    q = QmcRunner(n, replicas, seed=0)
    zz = np.zeros(4)
    for idx in range(4):
        z0 = 1.0 if idx & 1 else -1.0
        z1 = 1.0 if idx & 2 else -1.0
        zz[idx] = -1.0 * z0 * z1
    for i in range(n):
        q.add_diagonal_interaction(zz, [i, (i + 1) % n])
        q.add_interaction(np.array([0.0, -gamma, -gamma, 0.0]), [i])

    # slope timing between two sweep counts (floor-immune; see
    # bench_classical_graph.py)
    t_lo, t_hi = (4, 8) if smoke else (400, 1600)
    q.run_sampling(beta, t_lo)  # compile + warm (+ builds the grid)
    q.run_sampling(beta, t_hi)
    w = q._w
    ts = {t_lo: [], t_hi: []}
    for t in (t_lo, t_hi, t_lo, t_hi):
        t0 = time.perf_counter()
        q.run_sampling(beta, t)
        ts[t].append(time.perf_counter() - t0)
    dt = min(ts[t_hi]) - min(ts[t_lo])
    sweeps = t_hi - t_lo
    updates = replicas * n * w.Lt * sweeps
    print(
        json.dumps(
            {
                "metric": "generic_worldline_site_updates_per_sec_64chain",
                "value": round(updates / dt, 1),
                "unit": "site-subslice-updates/s",
                "Lt": w.Lt,
                "sweeps_per_sec": round(sweeps / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
