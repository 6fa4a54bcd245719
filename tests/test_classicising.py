"""ClassicIsing stateful-ensemble tests (classicising.rs parity, SURVEY 2.1 #3)."""

import numpy as np
import pytest

from pyisingmontecarlo_tpu import ClassicIsing

EDGES = [((0, 1), -1.0), ((1, 2), -1.0), ((2, 3), -1.0), ((3, 0), -1.0)]


def test_constructor_builds_experiments():
    ci = ClassicIsing(EDGES, num_experiments=5, seed=0)
    assert ci.num_graphs == 5
    assert ci.get_states().shape == (5, 4)


def test_add_graph_with_initial_state():
    ci = ClassicIsing(EDGES, num_experiments=0, seed=0)
    ci.add_graph(initial_state=[True, True, False, False])
    assert ci.num_graphs == 1
    np.testing.assert_array_equal(ci.get_states()[0], [True, True, False, False])
    with pytest.raises(ValueError):
        ci.add_graph(initial_state=[True])


def test_state_persists_across_calls():
    ci = ClassicIsing(EDGES, num_experiments=4, seed=1)
    ci.run_monte_carlo(10.0, 50)
    s1 = ci.get_states()
    # at huge beta the FM ring is frozen in a ground state; more single-flip
    # steps keep the exact configuration (worm moves stay off: a whole-ring
    # worm loop is a legitimate ZERO-energy move that global-flips a ground
    # state — exact-state persistence only holds for the basic family)
    ci.run_monte_carlo(10.0, 5, only_basic_moves=True)
    s2 = ci.get_states()
    e = ci.get_energies()
    assert (e == -4.0).all()
    assert (s1 == s2).all()


def test_run_returns_none_and_sampling_shapes():
    ci = ClassicIsing(EDGES, num_experiments=3, seed=2)
    assert ci.run_monte_carlo(1.0, 5) is None
    es, ss = ci.run_monte_carlo_sampling(1.0, 10, sampling_freq=3)
    assert es.shape == (3, 3)
    assert ss.shape == (3, 3, 4)


def test_move_count_knobs():
    ci = ClassicIsing(EDGES, num_experiments=2, seed=3)
    ci.run_monte_carlo(0.5, 3, nspinupdates=10, nedgeupdates=0, nwormupdates=0)
    ci.run_monte_carlo(0.5, 3, nspinupdates=1, nedgeupdates=8, nwormupdates=2)


def test_use_basic_moves_default():
    ci = ClassicIsing(EDGES, num_experiments=2, seed=4, use_basic_moves=True)
    ci.run_monte_carlo(1.0, 5)  # must not crash; spin sweeps only
    es, _ = ci.run_monte_carlo_sampling(1.0, 5)
    assert es.shape == (2, 5)


def test_longitudinal_field_thermodynamics():
    # single pair with strong field: both spins pushed down (h>0 favors s=-1)
    ci = ClassicIsing([((0, 1), 0.0)], longitudinal=2.0, num_experiments=64, seed=5)
    ci.run_monte_carlo(2.0, 60)
    m = np.where(ci.get_states(), 1, -1).mean()
    assert m < -0.9


def test_chunked_dispatch_bit_exact(monkeypatch):
    # PMC_STEPS_PER_DISPATCH splits the step scan across several XLA
    # dispatches; the (state, keys) carry preserves the exact RNG stream, so
    # trajectories must be bit-identical to the single-dispatch run.
    from pyisingmontecarlo_tpu.models.lattices import triangular_edges

    edges = triangular_edges(4, j=1.0)  # not a square torus -> graph engine
    ref = ClassicIsing(edges, num_experiments=4, seed=9)
    ref.run_monte_carlo(0.8, 13)
    s_ref = ref.get_states()

    monkeypatch.setenv("PMC_STEPS_PER_DISPATCH", "5")  # 5 + 5 + 3
    chk = ClassicIsing(edges, num_experiments=4, seed=9)
    chk.run_monte_carlo(0.8, 13)
    assert (chk.get_states() == s_ref).all()


def test_auto_chunked_dispatch_bit_exact(monkeypatch):
    # with no env var set, long runs pick steps_per_dispatch automatically
    # from a timed probe (engines/classical._auto_chunk); the trajectory must
    # still be bit-identical to a forced single dispatch
    from pyisingmontecarlo_tpu.engines import classical as ce
    from pyisingmontecarlo_tpu.models.lattices import triangular_edges

    edges = triangular_edges(4, j=1.0)
    T = ce._AUTO_MIN_STEPS + 9  # long enough to trigger the auto probe
    monkeypatch.setenv("PMC_STEPS_PER_DISPATCH", str(10 * T))  # single dispatch
    ref = ClassicIsing(edges, num_experiments=4, seed=21)
    ref.run_monte_carlo(0.8, T)
    s_ref = ref.get_states()

    monkeypatch.delenv("PMC_STEPS_PER_DISPATCH", raising=False)
    monkeypatch.setattr(ce, "_AUTO_DISPATCH_SECONDS", 1e-9)  # force tiny chunks
    chk = ClassicIsing(edges, num_experiments=4, seed=21)
    chk.run_monte_carlo(0.8, T)
    assert (chk.get_states() == s_ref).all()


def test_chunked_dispatch_energies_bit_exact(monkeypatch):
    from pyisingmontecarlo_tpu.lattice import Lattice
    from pyisingmontecarlo_tpu.models.lattices import triangular_edges

    edges = triangular_edges(4, j=1.0)
    betas = [(0, 0.2), (11, 2.0)]
    es_ref, ss_ref = Lattice(edges, seed_gen=3).run_monte_carlo_annealing_and_get_energies(
        betas, 11, 4
    )
    monkeypatch.setenv("PMC_STEPS_PER_DISPATCH", "4")
    es_chk, ss_chk = Lattice(edges, seed_gen=3).run_monte_carlo_annealing_and_get_energies(
        betas, 11, 4
    )
    assert (es_chk == es_ref).all()
    assert (ss_chk == ss_ref).all()
