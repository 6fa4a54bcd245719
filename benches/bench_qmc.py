"""TFIM worldline QMC throughput benchmark (BASELINE.json config:
"run_quantum_monte_carlo_sampling: TFIM chain ... Trotter layers").

Prints one JSON line: worldline site-updates/sec for a 256-site TFIM chain at
beta=2, Gamma=1, 64 replicas, through the public Lattice API."""

import json
import time

import numpy as np

from pyisingmontecarlo_tpu import Lattice
from pyisingmontecarlo_tpu.engines.worldline import choose_ltau


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _enable_cache()
    n = 256
    beta, gamma = 2.0, 1.0
    edges = [((i, (i + 1) % n), -1.0) for i in range(n)]
    lat = Lattice(edges, seed_gen=0)
    lat.set_transverse_field(gamma)
    replicas = 64
    ltau = choose_ltau(beta, gamma)

    # slope timing between two sweep counts (floor-immune; see
    # bench_classical_graph.py)
    t_lo, t_hi = 2000, 8000
    lat.run_quantum_monte_carlo(beta, t_lo, replicas)  # compile + warm
    lat.run_quantum_monte_carlo(beta, t_hi, replicas)
    ts = {t_lo: [], t_hi: []}
    for t in (t_lo, t_hi, t_lo, t_hi):
        t0 = time.perf_counter()
        lat.run_quantum_monte_carlo(beta, t, replicas)
        ts[t].append(time.perf_counter() - t0)
    dt = min(ts[t_hi]) - min(ts[t_lo])
    sweeps = t_hi - t_lo
    updates = replicas * n * ltau * sweeps
    print(
        json.dumps(
            {
                "metric": "tfim_worldline_site_updates_per_sec_256chain",
                "value": round(updates / dt, 1),
                "unit": "site-updates/s",
                "ltau": ltau,
                "sweeps_per_sec": round(sweeps / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
