"""TPU benches for the remaining BASELINE.json driver configs.

Covers the two configs not exercised by bench.py / bench_qmc.py /
bench_tempering.py:

- ``run_monte_carlo_annealing_and_get_energies`` on a frustrated triangular
  AFM (lattice.rs:395-470 contract; the annealing schedule is the documented
  linear interpolation, docs/DESIGN.md section 7),
- ``run_quantum_monte_carlo_and_measure_variable/bond_autocorrelation`` on a
  2D TFIM torus (lattice.rs:628-691 / 783-846 contracts).

Prints one JSON line per config.
"""

import json
import os
import time

import numpy as np


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def bench_annealing_triangular():
    import pyisingmontecarlo_tpu as pmc
    from pyisingmontecarlo_tpu.models.lattices import triangular_edges

    L, nexp, timesteps = 48, 100, 4000
    if os.environ.get("PMC_BENCH_SMOKE"):
        L, nexp, timesteps = 6, 4, 20
    edges = triangular_edges(L, j=1.0)  # AFM on triangular: frustrated
    lat = pmc.Lattice(edges, seed_gen=11)
    betas = [(0, 0.1), (timesteps, 3.0)]
    lat.run_monte_carlo_annealing_and_get_energies(betas, timesteps, nexp)
    t0 = time.perf_counter()
    es, ss = lat.run_monte_carlo_annealing_and_get_energies(betas, timesteps, nexp)
    dt = time.perf_counter() - t0
    nvars = L * L
    assert es.shape == (nexp, timesteps) and ss.shape == (nexp, nvars)
    print(
        json.dumps(
            {
                "metric": "annealing_triangular_afm_site_steps_per_sec",
                "value": round(nexp * nvars * timesteps / dt, 1),
                "unit": "site-steps/s",
                "nvars": nvars,
                "steps_per_sec": round(timesteps / dt, 2),
                "final_e_mean": round(float(es[:, -1].mean()), 3),
            }
        ),
        flush=True,
    )


def bench_autocorr_tfim2d():
    import pyisingmontecarlo_tpu as pmc
    from pyisingmontecarlo_tpu.models.lattices import square_edges

    L, nexp, timesteps, wait = 16, 64, 1000, 200
    if os.environ.get("PMC_BENCH_SMOKE"):
        L, nexp, timesteps, wait = 4, 4, 20, 5
    lat = pmc.Lattice(square_edges(L, j=-1.0), seed_gen=13)
    lat.set_transverse_field(1.0)
    out = {}
    for name in ("variable", "bond"):
        fn = getattr(lat, f"run_quantum_monte_carlo_and_measure_{name}_autocorrelation")
        fn(2.0, timesteps, nexp, sampling_wait_buffer=wait)
        t0 = time.perf_counter()
        corrs = fn(2.0, timesteps, nexp, sampling_wait_buffer=wait)
        dt = time.perf_counter() - t0
        assert corrs.shape[0] == nexp
        out[name] = dt
    print(
        json.dumps(
            {
                "metric": "tfim2d_autocorrelation_timesteps_per_sec",
                "value": round(timesteps / out["variable"], 1),
                "unit": "timesteps/s (variable)",
                "bond_timesteps_per_sec": round(timesteps / out["bond"], 1),
                "nvars": L * L,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    _enable_cache()
    bench_annealing_triangular()
    bench_autocorr_tfim2d()
