"""Benchmark driver: attempted spin flips/ns/chip, 1024^2 Metropolis ferromagnet.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The baseline
is the driver-set north star (>= 50 attempted flips/ns/chip on a v5e chip,
/root/repo/BASELINE.json); the reference publishes no numbers (BASELINE.md).

Workload parity: ``Lattice.run_monte_carlo`` on a 1024^2 periodic square
ferromagnet (J=-1) at fixed beta — the reference's benchmark path
(/root/reference/src/lattice.rs:171-221), with num_experiments a replica batch.
"""

import json
import time

import numpy as np

import pyisingmontecarlo_tpu as pmc
from pyisingmontecarlo_tpu.graph import grid_2d_edges

NORTH_STAR = 50.0  # attempted flips/ns/chip


def main():
    L = 1024
    beta = 0.4
    replicas = 8
    sweeps = 16384  # realistic production sweep count; amortizes dispatch
    edges = grid_2d_edges(L, L, j=-1.0)
    lat = pmc.Lattice(edges, seed_gen=0)

    # warmup: same shapes/sweep count so the timed run measures steady state
    lat.run_monte_carlo(beta, sweeps, replicas)

    t0 = time.perf_counter()
    lat.run_monte_carlo(beta, sweeps, replicas)
    dt = time.perf_counter() - t0

    attempted = float(replicas) * L * L * sweeps
    flips_per_ns = attempted / (dt * 1e9)
    print(
        json.dumps(
            {
                "metric": "attempted_spin_flips_per_ns_per_chip_1024sq_metropolis",
                "value": round(flips_per_ns, 3),
                "unit": "flips/ns/chip",
                "vs_baseline": round(flips_per_ns / NORTH_STAR, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
