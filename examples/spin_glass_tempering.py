"""Parallel tempering on a 2D +-J Edwards-Anderson spin glass: the beta ladder
finds low-energy states that single-temperature dynamics can't reach.

    python examples/spin_glass_tempering.py [L] [n_replicas]
"""

import sys

import numpy as np

from pyisingmontecarlo_tpu import LatticeTempering, models


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nrep = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    edges = models.pm_j_spin_glass_edges(L, seed=0)
    lt = LatticeTempering(edges, seed=0)
    for b in np.geomspace(0.3, 3.0, nrep):
        lt.add_graph(0.5, 0.0, float(b))
    lt.qmc_timesteps(200)
    states, energies = lt.qmc_timesteps_sample(400, replica_swap_freq=2, sampling_freq=40)
    print(f"# {L}x{L} +-J glass, {nrep}-rung ladder")
    print(f"accepted swaps: {lt.get_total_swaps()}")
    print(f"coldest-rung <E>: {energies[-1]:.2f}  ({len(edges)} bonds)")
    m = np.where(states[-1], 1, -1)
    print(f"coldest-rung |m|: {abs(m.mean()):.3f} (glass: should stay small)")


if __name__ == "__main__":
    main()
