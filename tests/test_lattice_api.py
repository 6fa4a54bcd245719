"""API-shape / gating / determinism tests for Lattice (SURVEY.md sections 2.2,
2.4: shapes, ValueError gating, seed reproducibility)."""

import numpy as np
import pytest

from pyisingmontecarlo_tpu import Lattice

EDGES = [((0, 1), -1.0), ((1, 2), -1.0), ((2, 3), -1.0), ((3, 0), -1.0)]


def test_run_monte_carlo_shapes():
    lat = Lattice(EDGES, seed_gen=0)
    es, ss = lat.run_monte_carlo(1.0, 10, 7)
    assert es.shape == (7,) and es.dtype == np.float64
    assert ss.shape == (7, 4) and ss.dtype == bool


def test_sampling_shapes_integer_division():
    # timesteps/sampling_freq uses integer division (SURVEY 2.4.5)
    lat = Lattice(EDGES, seed_gen=0)
    es, ss = lat.run_monte_carlo_sampling(1.0, 11, 3, sampling_freq=4)
    assert es.shape == (3, 2)
    assert ss.shape == (3, 2, 4)


def test_sampling_freq_none_means_one():
    lat = Lattice(EDGES, seed_gen=0)
    es, ss = lat.run_monte_carlo_sampling(1.0, 5, 2)
    assert es.shape == (2, 5)


def test_annealing_shapes():
    lat = Lattice(EDGES, seed_gen=0)
    es, ss = lat.run_monte_carlo_annealing([(0, 0.1), (50, 2.0)], 50, 3)
    assert es.shape == (3,)
    assert ss.shape == (3, 4)
    es2, ss2 = lat.run_monte_carlo_annealing_and_get_energies([(0, 0.1), (50, 2.0)], 50, 3)
    assert es2.shape == (3, 50)
    assert ss2.shape == (3, 4)


def test_annealing_empty_schedule_is_beta_one():
    lat = Lattice(EDGES, seed_gen=0)
    sched = lat._anneal_schedule([], 10)
    np.testing.assert_array_equal(sched, np.ones(10))


def test_annealing_linear_interpolation():
    # documented intent (lattice.rs:304), not the reference's shadowing bug
    lat = Lattice(EDGES, seed_gen=0)
    sched = lat._anneal_schedule([(2, 1.0), (6, 3.0)], 8)
    np.testing.assert_allclose(sched[2:7], [1.0, 1.5, 2.0, 2.5, 3.0])
    np.testing.assert_allclose(sched[:2], [1.0, 1.0])  # padded to t=0
    np.testing.assert_allclose(sched[7], 3.0)  # padded to t=T


def test_classical_rejects_transverse():
    lat = Lattice(EDGES, seed_gen=0)
    lat.set_transverse_field(1.0)
    with pytest.raises(ValueError):
        lat.run_monte_carlo(1.0, 5, 2)


def test_transverse_field_gating():
    lat = Lattice(EDGES, seed_gen=0)
    with pytest.raises(ValueError):
        lat.set_transverse_field(-1.0)
    lat.set_transverse_field(1.0)
    assert lat.transverse == 1.0
    lat.set_transverse_field(0.0)  # clears (lattice.rs:138-140)
    assert lat.transverse is None
    lat.run_monte_carlo(1.0, 2, 2)  # classical works again


def test_individual_bias_oob():
    lat = Lattice(EDGES, seed_gen=0)
    with pytest.raises(ValueError):
        lat.set_individual_bias(10, 1.0)


def test_individual_bias_promotes_global():
    lat = Lattice(EDGES, seed_gen=0)
    lat.set_global_bias(0.5)
    lat.set_individual_bias(1, -1.0)
    assert lat.bias[0] == "individual"
    np.testing.assert_allclose(lat.bias[1], [0.5, -1.0, 0.5, 0.5])


def test_initial_state_validation():
    lat = Lattice(EDGES, seed_gen=0)
    with pytest.raises(ValueError):
        lat.set_initial_state([True, False])
    lat.set_initial_state([True, True, False, False])
    assert lat.initial_state is not None
    lat.set_initial_state([])
    assert lat.initial_state is None


def test_initial_state_used():
    lat = Lattice(EDGES, seed_gen=0)
    lat.set_initial_state([True, True, True, True])
    es, ss = lat.run_monte_carlo(50.0, 0, 3)  # zero steps: state unchanged
    assert ss.all()
    np.testing.assert_allclose(es, -4.0)


def test_make_seeds_reproducible():
    lat = Lattice(EDGES, seed_gen=42)
    s1 = lat.make_seeds(5)
    lat.set_seed_gen(42)
    s2 = lat.make_seeds(5)
    assert s1 == s2
    s3 = lat.make_seeds(5)  # stream advances
    assert s3 != s1


def test_run_determinism():
    lat1 = Lattice(EDGES, seed_gen=123)
    e1, s1 = lat1.run_monte_carlo(0.5, 20, 8)
    lat2 = Lattice(EDGES, seed_gen=123)
    e2, s2 = lat2.run_monte_carlo(0.5, 20, 8)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(s1, s2)


def test_experiment_seed_batch_independence():
    # experiment i's trajectory depends only on its seed: the first 4
    # experiments of an 8-batch match a 4-batch run with the same seed_gen
    lat1 = Lattice(EDGES, seed_gen=9)
    e8, s8 = lat1.run_monte_carlo(0.5, 10, 8)
    lat2 = Lattice(EDGES, seed_gen=9)
    e4, s4 = lat2.run_monte_carlo(0.5, 10, 4)
    np.testing.assert_array_equal(e8[:4], e4)
    np.testing.assert_array_equal(s8[:4], s4)


def test_clone_independent():
    lat = Lattice(EDGES, seed_gen=1)
    other = lat.clone()
    assert other.make_seeds(3) == lat.make_seeds(3)
    other.set_global_bias(2.0)
    assert lat.bias == ("global", 0.0)


def test_quantum_gating():
    lat = Lattice(EDGES, seed_gen=0)
    with pytest.raises(ValueError):
        lat.run_quantum_monte_carlo(1.0, 5, 2)  # no transverse field
    lat.set_transverse_field(1.0)
    lat.set_individual_bias(0, 1.0)
    with pytest.raises(ValueError):
        lat.run_quantum_monte_carlo(1.0, 5, 2)  # individual bias rejected
