"""Cross-API consistency: the same physics must come out of every class that
can express a given model (the framework's substitute for cross-validating
against the unbuildable Rust wheel, BASELINE.md)."""

import numpy as np

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import Lattice, LatticeTempering, QmcIsing

EDGES = [((i, (i + 1) % 4), -1.0) for i in range(4)]
BETA, GAMMA = 1.5, 1.0


def test_lattice_vs_qmcising_vs_tempering_agree():
    ex = dense_tfim_energy(EDGES, 0.0, GAMMA, BETA, 4)

    lat = Lattice(EDGES, seed_gen=0)
    lat.set_transverse_field(GAMMA)
    e_lat, _ = lat.run_quantum_monte_carlo_sampling(BETA, 200, 64, sampling_wait_buffer=120)

    q = QmcIsing(EDGES, GAMMA, num_experiments=64, seed=1)
    e_q, _ = q.run_sampling(BETA, 200, sampling_wait_buffer=120)

    lt = LatticeTempering(EDGES, seed=2)
    for _ in range(16):
        lt.add_graph(GAMMA, 0.0, BETA)  # flat ladder: swaps are identity-physics
    lt.qmc_timesteps(120)
    _, e_t = lt.qmc_timesteps_sample(200, replica_swap_freq=4)

    for name, es in (("Lattice", e_lat), ("QmcIsing", e_q), ("Tempering", e_t)):
        se = es.std(ddof=1) / np.sqrt(len(es))
        assert abs(es.mean() - ex) < 5 * se + 0.05, (name, es.mean(), ex, se)


def test_tempering_heatbath_rvb_flags_preserve_equilibrium():
    # replicas with different update-family flags at the SAME (beta, Gamma)
    # must all sample the same distribution
    ex = dense_tfim_energy(EDGES, 0.0, GAMMA, BETA, 4)
    lt = LatticeTempering(EDGES, seed=3)
    for k in range(24):
        lt.add_graph(
            GAMMA, 0.0, BETA,
            enable_rvb_update=bool(k % 2),
            enable_heatbath_update=bool((k // 2) % 2),
        )
    lt.qmc_timesteps(150)
    _, es = lt.qmc_timesteps_sample(250, replica_swap_freq=5)
    se = es.std(ddof=1) / np.sqrt(len(es))
    assert abs(es.mean() - ex) < 5 * se + 0.05, (es.mean(), ex, se)
    assert lt.get_total_swaps() > 0  # flat ladder: swaps accept freely
