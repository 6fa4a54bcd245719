"""sampling_freq semantics in the stateful classes + empty-container no-ops.

Round-2 fixes (VERDICT.md item 4, ADVICE.md medium/low): the reference
forwards ``sampling_freq`` to ``calculate_*_autocorrelation``
(/root/reference/src/qmcising.rs:316) while keeping the ``[n, timesteps]``
output shape — the crate's t/freq-length series lands in the leading columns
of a zero-filled array (qmcising.rs:306-321). Runs on an empty container are
no-ops (the reference iterates an empty Vec).
"""

import numpy as np
import pytest

from pyisingmontecarlo_tpu import LatticeTempering, QmcIsing, QmcRunner
from pyisingmontecarlo_tpu.models.lattices import chain_edges

EDGES = [((0, 1), -1.0), ((1, 2), -1.0)]
T = 24


def _assert_freq_semantics(corr1, corr2, timesteps):
    """freq=2 keeps the [n, timesteps] shape, fills only the first t/2
    columns, and produces a genuinely different (coarser) series."""
    assert corr1.shape == corr2.shape == (corr1.shape[0], timesteps)
    assert np.all(corr2[:, timesteps // 2 :] == 0.0)
    assert not np.allclose(corr1[:, : timesteps // 2], corr2[:, : timesteps // 2])


def test_qmcising_autocorr_sampling_freq():
    def corr(freq):
        q = QmcIsing(EDGES, transverse=1.0, num_experiments=4, seed=11)
        return q.run_quantum_monte_carlo_and_measure_variable_autocorrelation(
            1.0, T, sampling_freq=freq
        )

    _assert_freq_semantics(corr(1), corr(2), T)


def test_qmcising_bond_autocorr_sampling_freq():
    def corr(freq):
        q = QmcIsing(EDGES, transverse=1.0, num_experiments=4, seed=11)
        return q.run_quantum_monte_carlo_and_measure_bond_autocorrelation(
            1.0, T, sampling_freq=freq
        )

    _assert_freq_semantics(corr(1), corr(2), T)


def test_qmcrunner_autocorr_sampling_freq():
    def corr(freq):
        r = QmcRunner(2, 4, seed=5)
        r.add_diagonal_interaction_and_offset([1.0, -1.0, -1.0, 1.0], [0, 1])
        r.add_interaction([0.0, 0.7, 0.7, 0.0], [0])
        return r.run_quantum_monte_carlo_and_measure_variable_autocorrelation(
            1.0, T, sampling_freq=freq
        )

    _assert_freq_semantics(corr(1), corr(2), T)


def test_tempering_autocorr_sampling_freq():
    def corr(freq):
        lt = LatticeTempering(EDGES, seed=3)
        for beta in (0.5, 1.0):
            lt.add_graph(1.0, 0.0, beta)
        return lt.run_quantum_monte_carlo_and_measure_variable_autocorrelation(
            T, sampling_freq=freq
        )

    _assert_freq_semantics(corr(1), corr(2), T)


def test_qmcising_empty_container_is_noop():
    q = QmcIsing(EDGES, transverse=1.0, num_experiments=0, seed=1)
    assert q.num_graphs == 0
    q.run_qmc(1.0, 5)  # no-op, no raise
    q.run_diagonal(1.0)
    assert q.run_cluster().shape == (0,)
    assert q.run_rvb(3).shape == (0, 3)
    es, ss = q.run_sampling(1.0, 10, sampling_freq=2)
    assert es.shape == (0,)
    assert ss.shape == (0, 5, 3)
    assert q.run_bond_sampling(1.0, 10).shape == (0, 10, 2)
    corr = q.run_quantum_monte_carlo_and_measure_variable_autocorrelation(1.0, 7)
    assert corr.shape == (0, 7)
    assert q.get_offset() == 0.0


def test_chain_edges_small_n():
    assert chain_edges(2, periodic=True) == [((0, 1), -1.0)]
    assert chain_edges(2, periodic=False) == [((0, 1), -1.0)]
    assert len(chain_edges(3, periodic=True)) == 3
    with pytest.raises(ValueError):
        chain_edges(1)
