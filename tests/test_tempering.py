"""LatticeTempering tests: API parity, swap correctness (equilibrium preserved),
mixed ensembles, checkpointing (tempering.rs parity, SURVEY 2.1 #6)."""

import numpy as np
import pytest

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import LatticeTempering

EDGES = [((i, (i + 1) % 4), -1.0) for i in range(4)]


def ladder(nrep=4, seed=0, betas=None, gamma=1.0):
    lt = LatticeTempering(EDGES, seed=seed)
    betas = betas if betas is not None else np.linspace(0.5, 2.0, nrep)
    for b in betas:
        lt.add_graph(gamma, 0.0, float(b))
    return lt


def test_add_graph_and_counts():
    lt = ladder(5)
    assert lt.get_num_graphs() == 5
    assert lt.get_total_swaps() == 0
    assert lt.cutoff == 4


def test_gamma_must_be_positive():
    lt = LatticeTempering(EDGES, seed=0)
    with pytest.raises(ValueError):
        lt.add_graph(0.0, 0.0, 1.0)


def test_no_graphs_raises():
    lt = LatticeTempering(EDGES, seed=0)
    with pytest.raises(ValueError):
        lt.qmc_timesteps(5)


def test_timesteps_and_sample_shapes():
    lt = ladder(4)
    lt.qmc_timesteps(5)
    states, energies = lt.qmc_timesteps_sample(12, replica_swap_freq=3, sampling_freq=2)
    assert states.shape == (4, 6, 4)
    assert energies.shape == (4,)
    assert lt.get_total_swaps() >= 0


def test_swaps_happen():
    # tight ladder: nearly identical replicas swap almost always
    lt = ladder(6, betas=np.linspace(1.0, 1.05, 6), seed=1)
    lt.qmc_timesteps_sample(40, replica_swap_freq=1)
    # ~2-3 eligible pairs per phase * 40 phases; most should accept
    assert lt.get_total_swaps() > 20


def test_equilibrium_preserved_with_swaps():
    # each rung must still sample its own Boltzmann distribution: check <E>
    # per rung against dense diagonalization
    betas = [1.0, 1.5, 2.0, 2.5]
    R = 24  # independent ladders per rung for statistics: use repeated rungs
    lt = LatticeTempering(EDGES, seed=2)
    for _ in range(R // len(betas)):
        for b in betas:
            lt.add_graph(1.0, 0.0, b)
    lt.qmc_timesteps(150)  # thermalize (swaps off)
    states, energies = lt.qmc_timesteps_sample(250, replica_swap_freq=5)
    energies = energies.reshape(R // len(betas), len(betas))
    for k, b in enumerate(betas):
        ex = dense_tfim_energy(EDGES, 0.0, 1.0, b, 4)
        em = energies[:, k].mean()
        se = energies[:, k].std(ddof=1) / np.sqrt(energies.shape[0])
        assert abs(em - ex) < 5 * se + 0.06, (b, em, ex, se)
    assert lt.get_total_swaps() > 0


def test_mixed_ensemble_per_replica_edges():
    lt = LatticeTempering(EDGES, seed=3)
    lt.add_graph(1.0, 0.0, 1.0)
    # replica with a different coupling set (subset + sign flip)
    lt.add_graph(1.0, 0.2, 1.5, edges=[((0, 1), 1.0), ((2, 3), -0.5)])
    lt.add_graph(0.8, 0.0, 2.0, enable_rvb_update=True, enable_heatbath_update=True)
    states, energies = lt.qmc_timesteps_sample(10)
    assert states.shape[0] == 3
    assert np.isfinite(energies).all()


def test_per_replica_edge_oob():
    lt = LatticeTempering(EDGES, seed=4)
    with pytest.raises(ValueError):
        lt.add_graph(1.0, 0.0, 1.0, edges=[((0, 9), 1.0)])


def test_itime_shapes():
    lt = ladder(3)
    lt.qmc_timesteps(3)
    it = lt.get_graph_itime(1)
    assert it.ndim == 2 and it.shape[1] == 4
    with pytest.raises(ValueError):
        lt.get_graph_itime(5)


def test_autocorrelation_shapes():
    lt = ladder(3)
    c = lt.run_quantum_monte_carlo_and_measure_variable_autocorrelation(
        20, sampling_wait_buffer=5, replica_swap_freq=2
    )
    assert c.shape == (3, 20)
    np.testing.assert_allclose(c[:, 0], 1.0, atol=1e-9)
    cb = lt.run_quantum_monte_carlo_and_measure_bond_autocorrelation(15)
    assert cb.shape == (3, 15)


def test_checkpoint_roundtrip(tmp_path):
    lt = ladder(3, seed=5)
    lt.qmc_timesteps_sample(10, replica_swap_freq=2)
    swaps = lt.get_total_swaps()
    path = str(tmp_path / "t.cbor")
    lt.save_to_file(path)
    lt2 = LatticeTempering.read_from_file(path, reseed=7)
    assert lt2.get_num_graphs() == 3
    assert lt2.get_total_swaps() == swaps
    np.testing.assert_array_equal(lt2.get_graph_itime(0), lt.get_graph_itime(0))
    lt2.qmc_timesteps(3)  # still runnable after reload


def test_clone():
    lt = ladder(3, seed=6)
    lt.qmc_timesteps(3)
    other = lt.clone()
    other.add_graph(1.0, 0.0, 3.0)
    assert lt.get_num_graphs() == 3
    assert other.get_num_graphs() == 4
