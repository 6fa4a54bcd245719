"""Large-spatial TFIM worldline QMC throughput (VERDICT round-2 item 6).

Prints one JSON line: worldline site-updates/sec for a 256 x 256 TFIM torus at
beta=2, Gamma=1 through the public Lattice API — the production-size 2D
quantum lattice the reference runs with uniform SSE cost
(/root/reference/src/lattice.rs:546-617). Exercises the large-plane
(row-accumulator) mode of the fused Pallas kernel (ops/wl_pallas.py); set
PMC_WORLDLINE_NO_PALLAS=1 to measure the XLA colored path instead.
"""

import json
import os
import time


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _enable_cache()
    from pyisingmontecarlo_tpu import Lattice
    from pyisingmontecarlo_tpu.engines.worldline import choose_ltau
    from pyisingmontecarlo_tpu.models.lattices import square_edges

    L = int(os.environ.get("PMC_BENCH_L", "256"))
    beta, gamma = 2.0, 1.0
    replicas = int(os.environ.get("PMC_BENCH_R", "8"))
    lat = Lattice(square_edges(L, j=-1.0), seed_gen=0)
    lat.set_transverse_field(gamma)
    ltau = choose_ltau(beta, gamma)
    n = L * L

    # slope timing between two sweep counts (floor-immune; see
    # bench_classical_graph.py)
    t_lo = int(os.environ.get("PMC_BENCH_SWEEPS", "200"))
    t_hi = 4 * t_lo
    es, _ = lat.run_quantum_monte_carlo(beta, t_lo, replicas)  # compile + warm
    lat.run_quantum_monte_carlo(beta, t_hi, replicas)
    ts = {t_lo: [], t_hi: []}
    for t in (t_lo, t_hi, t_lo, t_hi):
        t0 = time.perf_counter()
        es, _ = lat.run_quantum_monte_carlo(beta, t, replicas)
        ts[t].append(time.perf_counter() - t0)
    dt = min(ts[t_hi]) - min(ts[t_lo])
    sweeps = t_hi - t_lo
    updates = replicas * n * ltau * sweeps
    print(
        json.dumps(
            {
                "metric": f"tfim_worldline_site_updates_per_sec_{L}x{L}",
                "value": round(updates / dt, 1),
                "unit": "site-updates/s",
                "ltau": ltau,
                "nvars": n,
                "replicas": replicas,
                "sweeps_per_sec": round(sweeps / dt, 2),
                "e_per_site": round(float(es.mean()) / n, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
