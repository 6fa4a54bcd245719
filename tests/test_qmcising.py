"""QmcIsing stateful-ensemble + checkpoint tests (qmcising.rs parity)."""

import numpy as np
import pytest

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import QmcIsing

EDGES = [((i, (i + 1) % 4), -1.0) for i in range(4)]


def test_constructor_and_counts():
    q = QmcIsing(EDGES, 1.0, num_experiments=3, seed=0)
    assert q.num_graphs == 3
    q.add_qmc()
    assert q.num_graphs == 4


def test_run_qmc_returns_none_and_sampling():
    q = QmcIsing(EDGES, 1.0, num_experiments=4, seed=1)
    assert q.run_qmc(1.0, 5) is None
    es, ss = q.run_sampling(1.0, 12, sampling_freq=3)
    assert es.shape == (4,)
    assert ss.shape == (4, 4, 4)
    assert ss.dtype == bool


def test_sampling_matches_exact():
    q = QmcIsing(EDGES, 1.0, num_experiments=96, seed=2)
    es, _ = q.run_sampling(2.0, 200, sampling_wait_buffer=150)
    ex = dense_tfim_energy(EDGES, 0.0, 1.0, 2.0, 4)
    se = es.std(ddof=1) / np.sqrt(len(es))
    assert abs(es.mean() - ex) < 4 * se + 0.04, (es.mean(), ex, se)


def test_run_diagonal_and_cluster_and_rvb():
    q = QmcIsing(EDGES, 1.0, num_experiments=5, seed=3)
    q.run_diagonal(1.0, 3)
    sizes = q.run_cluster()
    assert sizes.shape == (5,)
    assert (sizes >= 1).all()
    ratios = q.run_rvb(4)
    assert ratios.shape == (5, 4)
    assert ((ratios >= 0) & (ratios <= 1)).all()


def test_bond_sampling_shapes_and_magnitude():
    q = QmcIsing(EDGES, 1.0, num_experiments=8, seed=4)
    counts = q.run_bond_sampling(2.0, 20, sampling_wait_buffer=20, sampling_freq=2)
    assert counts.shape == (8, 10, 4)
    assert (counts >= 0).all()
    # FM ring at beta=2: bonds mostly satisfied -> <n_b> ~ beta*(|J|-J<ss>) ~ 4
    assert 1.0 < counts.mean() < 6.0


def test_autocorrelation_shapes():
    q = QmcIsing(EDGES, 1.0, num_experiments=4, seed=5)
    c = q.run_quantum_monte_carlo_and_measure_variable_autocorrelation(1.0, 30)
    assert c.shape == (4, 30)  # [n, timesteps], SURVEY 2.4 quirk 2
    np.testing.assert_allclose(c[:, 0], 1.0, atol=1e-9)
    c2 = q.run_quantum_monte_carlo_and_measure_bond_autocorrelation(1.0, 25)
    assert c2.shape == (4, 25)
    c3 = q.run_quantum_monte_carlo_and_measure_spin_product_autocorrelation(
        1.0, 20, [[0, 1], [2, 3]]
    )
    assert c3.shape == (4, 20)
    with pytest.raises(ValueError):
        q.run_quantum_monte_carlo_and_measure_spin_product_autocorrelation(1.0, 5, [[0, 9]])


def test_get_graph_itime():
    q = QmcIsing(EDGES, 1.0, num_experiments=2, seed=6)
    q.run_qmc(1.5, 5)
    it = q.get_graph_itime(0)
    assert it.ndim == 2 and it.shape[1] == 4
    assert it.dtype == bool
    with pytest.raises(ValueError):
        q.get_graph_itime(7)


def test_get_offset():
    q = QmcIsing(EDGES, 2.0, longitudinal=0.5, num_experiments=1, seed=7)
    assert q.get_offset() == pytest.approx(4.0 + 4 * 0.5 + 4 * 2.0)
    q0 = QmcIsing(EDGES, 1.0, num_experiments=0, seed=7)
    assert q0.get_offset() == 0.0


def test_transverse_must_be_positive():
    with pytest.raises(ValueError):
        QmcIsing(EDGES, 0.0)


def test_beta_regrid_preserves_state_validity():
    q = QmcIsing(EDGES, 1.0, num_experiments=3, seed=8)
    q.run_qmc(1.0, 5)
    L1 = q._w.L
    q.run_qmc(3.0, 5)  # regrid to longer imaginary time
    assert q._w.L > L1
    es, _ = q.run_sampling(3.0, 10)
    assert np.isfinite(es).all()


def test_checkpoint_roundtrip(tmp_path):
    q = QmcIsing(EDGES, 1.3, longitudinal=0.2, num_experiments=3, seed=9,
                 do_heatbath_updates=True, do_rvb_updates=True)
    q.run_qmc(1.5, 8)
    path = str(tmp_path / "ck.cbor")
    q.save_to_file(path)
    q2 = QmcIsing.read_from_file(path, reseed=123)
    assert q2.num_graphs == 3
    assert q2.transverse == 1.3
    assert q2.longitudinal == 0.2
    assert q2.enable_heatbath and q2.enable_rvb
    # worldline state restored exactly
    np.testing.assert_array_equal(q2.get_graph_itime(0), q.get_graph_itime(0))
    # reseeded runs still work (RNG not restored by design, qmcising.rs:485-486)
    es, _ = q2.run_sampling(1.5, 5)
    assert np.isfinite(es).all()


def test_checkpoint_io_error():
    q = QmcIsing(EDGES, 1.0, num_experiments=1, seed=10)
    with pytest.raises(IOError):
        q.save_to_file("/nonexistent/dir/x.cbor")
    with pytest.raises(IOError):
        QmcIsing.read_from_file("/nonexistent/dir/x.cbor")


def test_clone_independent():
    q = QmcIsing(EDGES, 1.0, num_experiments=2, seed=11)
    q.run_qmc(1.0, 3)
    q2 = q.clone()
    np.testing.assert_array_equal(q.get_graph_itime(0), q2.get_graph_itime(0))
    q2.run_qmc(1.0, 5)  # advancing the clone leaves the original untouched
    assert q.num_graphs == 2
