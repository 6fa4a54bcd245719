"""Seed-reproducibility of the quantum paths (lattice.rs:76-91 contract)."""

import numpy as np

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import LatticeTempering, Lattice, QmcIsing

EDGES = [((i, (i + 1) % 4), -1.0) for i in range(4)]


def test_lattice_quantum_deterministic():
    def run():
        lat = Lattice(EDGES, seed_gen=77)
        lat.set_transverse_field(1.0)
        return lat.run_quantum_monte_carlo_sampling(1.5, 20, 6)

    e1, s1 = run()
    e2, s2 = run()
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(s1, s2)


def test_qmcising_deterministic_and_batch_independent():
    def run(n):
        q = QmcIsing(EDGES, 1.0, num_experiments=n, seed=5)
        q.run_qmc(1.0, 10)
        return q.get_graph_itime(0)

    a, b, c = run(3), run(3), run(6)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)  # graph 0 independent of batch size


def test_tempering_deterministic():
    def run():
        lt = LatticeTempering(EDGES, seed=9)
        for bb in (0.8, 1.2, 1.6):
            lt.add_graph(1.0, 0.0, bb)
        s, e = lt.qmc_timesteps_sample(15, replica_swap_freq=3)
        return s, e, lt.get_total_swaps()

    s1, e1, w1 = run()
    s2, e2, w2 = run()
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(e1, e2)
    assert w1 == w2


def test_qmcising_beta_regrid_physics():
    # run at beta=1, then at beta=2.5 (regrid): energies must match dense
    # diagonalization at the NEW beta
    q = QmcIsing(EDGES, 1.0, num_experiments=96, seed=11)
    q.run_qmc(1.0, 60)
    es, _ = q.run_sampling(2.5, 200, sampling_wait_buffer=150)
    ex = dense_tfim_energy(EDGES, 0.0, 1.0, 2.5, 4)
    se = es.std(ddof=1) / np.sqrt(len(es))
    assert abs(es.mean() - ex) < 4 * se + 0.04, (es.mean(), ex, se)
