"""Edge-case robustness: isolated vertices, duplicate edges, degenerate runs."""

import numpy as np
import pytest

from pyisingmontecarlo_tpu import ClassicIsing, Lattice, QmcIsing
from pyisingmontecarlo_tpu.graph import compile_graph


def test_isolated_vertex():
    # edges skip vertex 1: it exists (nvars = max+1) with degree 0 and must
    # behave as a free spin coupled only to its bias
    edges = [((0, 2), -1.0)]
    cg = compile_graph(edges)
    assert cg.nvars == 3
    assert list(cg.degree) == [1, 0, 1]
    lat = Lattice(edges, seed_gen=0)
    lat.set_individual_bias(1, 3.0)
    es, ss = lat.run_monte_carlo_sampling(2.0, 40, 64, thermalization_time=40)
    m1 = np.where(ss[:, :, 1], 1.0, -1.0).mean()
    assert m1 < -0.95  # strong +bias pushes the free spin down


def test_isolated_vertex_quantum():
    edges = [((0, 2), -1.0)]
    lat = Lattice(edges, seed_gen=1)
    lat.set_transverse_field(1.0)
    es, ss = lat.run_quantum_monte_carlo_sampling(1.0, 50, 16, sampling_wait_buffer=30)
    assert np.isfinite(es).all()
    assert ss.shape == (16, 50, 3)


def test_duplicate_edges_accumulate():
    # two parallel edges between the same pair: couplings add in the energy
    lat = Lattice([((0, 1), -0.5), ((0, 1), -0.5)], seed_gen=0)
    lat.set_initial_state([True, True])
    es, _ = lat.run_monte_carlo(1.0, 0, 2)
    np.testing.assert_allclose(es, -1.0)


def test_single_edge_minimal_graph():
    q = QmcIsing([((0, 1), -1.0)], 1.0, num_experiments=2, seed=0)
    q.run_qmc(0.5, 3)
    assert q.get_graph_itime(0).shape[1] == 2


def test_zero_timesteps_everywhere():
    lat = Lattice([((0, 1), -1.0)], seed_gen=0)
    es, ss = lat.run_monte_carlo(1.0, 0, 3)
    assert es.shape == (3,)
    ci = ClassicIsing([((0, 1), -1.0)], num_experiments=2, seed=0)
    ci.run_monte_carlo(1.0, 0)
    q = QmcIsing([((0, 1), -1.0)], 1.0, num_experiments=2, seed=0)
    es2 = None
    q.run_qmc(1.0, 0)


def test_large_bias_no_overflow():
    lat = Lattice([((0, 1), -1.0)], seed_gen=0)
    lat.set_global_bias(1e6)
    es, ss = lat.run_monte_carlo(1.0, 20, 4)
    assert np.isfinite(es).all()
    assert not ss.any()  # huge +h: all spins down
