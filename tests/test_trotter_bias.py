"""Trotter-error control (VERDICT round-3 item 4).

The reference's SSE formulation is Trotter-bias-free by construction
(/root/reference/src/qmcising.rs:37-143); this framework's worldline
formulation carries an O(dtau^2) bias that the public `dtau` knob (or the
PMC_DTAU env var) controls. These tests pin down:

1. the knob threads into choose_ltau on every public class;
2. the formulation's bias really is O(dtau^2) — checked deterministically
   against a transfer-matrix evaluation of the *same* Trotterized partition
   function the engine samples (weights of engines/worldline.log_weight:
   exp(-dtau*E_z) diagonal factors, cosh/sinh time-link factors);
3. the MC engine at coarse dtau reproduces the Trotterized-exact energy (its
   estimator is exactly -d lnZ_trot/d beta at fixed L), i.e. the only error
   vs the true quantum value is the controllable Trotter term;
4. Richardson extrapolation over two dtau values cancels the leading term
   (the recipe documented in docs/DESIGN.md "Trotter error control").
"""

import numpy as np
import pytest

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import Lattice, LatticeTempering, QmcIsing, QmcRunner
from pyisingmontecarlo_tpu.engines import worldline as wl

EDGES = [((0, 1), -1.0)]  # 2-site FM pair
BETA, GAMMA = 2.0, 1.0


def trotterized_energy(L: int, beta: float = BETA, gamma: float = GAMMA) -> float:
    """Exact -d lnZ_trot/d beta for the 2-site TFIM at L slices, with the
    identical discretization the engine samples (worldline.log_weight)."""

    def lnZ(b):
        dt = b / L
        a = dt * gamma
        states = np.array([[1, 1], [1, -1], [-1, 1], [-1, -1]], float)
        Ez = -1.0 * states[:, 0] * states[:, 1]
        D = np.diag(np.exp(-dt * Ez))
        x1 = np.array([[np.cosh(a), np.sinh(a)], [np.sinh(a), np.cosh(a)]])
        T = D @ np.kron(x1, x1)
        return np.log(np.trace(np.linalg.matrix_power(T, L)))

    eps = 1e-6
    return -(lnZ(beta + eps) - lnZ(beta - eps)) / (2 * eps)


# ------------------------------------------------------------------ plumbing


def test_dtau_knob_reaches_every_class():
    # Lattice
    lat = Lattice(EDGES, seed_gen=0, dtau=0.5)
    lat.set_transverse_field(GAMMA)
    w = lat._worldline(2, BETA)
    assert w.L == wl.choose_ltau(BETA, GAMMA, 0.5) == 4
    lat2 = Lattice(EDGES, seed_gen=0, dtau=0.05)
    lat2.set_transverse_field(GAMMA)
    assert lat2._worldline(2, BETA).L == 40
    assert lat2.clone().dtau == 0.05
    # QmcIsing
    qi = QmcIsing(EDGES, GAMMA, num_experiments=2, seed=0, dtau=0.5)
    assert qi._ensure(BETA).L == 4
    qi2 = QmcIsing(EDGES, GAMMA, num_experiments=2, seed=0, dtau=0.05)
    assert qi2._ensure(BETA).L == 40
    # QmcRunner: finer dtau -> proportionally longer grid
    def runner_Lt(d):
        qr = QmcRunner(2, 2, seed=0, dtau=d)
        qr.add_diagonal_interaction([1.0, -1.0, -1.0, 1.0], [0, 1])
        return qr._ensure(BETA).Lt

    assert runner_Lt(0.05) > 4 * runner_Lt(0.5)
    # LatticeTempering
    lt = LatticeTempering(EDGES, seed=0, dtau=0.5)
    lt.add_graph(GAMMA, 0.0, BETA)
    assert lt._materialize()["s"].shape[2] == 4
    lt2 = LatticeTempering(EDGES, seed=0, dtau=0.05)
    lt2.add_graph(GAMMA, 0.0, BETA)
    assert lt2._materialize()["s"].shape[2] == 40


def test_pmc_dtau_env_and_validation(monkeypatch):
    base = wl.choose_ltau(BETA, GAMMA)
    monkeypatch.setenv("PMC_DTAU", "0.5")
    assert wl.choose_ltau(BETA, GAMMA) == 4 != base
    # explicit argument wins over the env var
    assert wl.choose_ltau(BETA, GAMMA, 0.05) == 40
    monkeypatch.delenv("PMC_DTAU")
    with pytest.raises(ValueError):
        wl.resolve_dtau(0.0)
    with pytest.raises(ValueError):
        wl.resolve_dtau(-0.1)


# ------------------------------------------------- deterministic bias scaling


def test_bias_is_quadratic_in_dtau():
    ex = dense_tfim_energy(EDGES, 0.0, GAMMA, BETA, 2)
    errs = [trotterized_energy(L) - ex for L in (4, 8, 16, 32)]
    assert all(abs(a) > abs(b) for a, b in zip(errs, errs[1:]))
    for a, b in zip(errs, errs[1:]):  # halving dtau quarters the bias
        assert 0.15 < b / a < 0.35, errs


def test_richardson_extrapolation_cancels_leading_term():
    ex = dense_tfim_energy(EDGES, 0.0, GAMMA, BETA, 2)
    e1, e2 = trotterized_energy(8), trotterized_energy(16)
    rich = (4.0 * e2 - e1) / 3.0
    assert abs(rich - ex) < 0.15 * abs(e1 - ex), (rich, e1, e2, ex)


# ------------------------------------------------------------- engine checks


def mc_energy(dtau, n=192, t=260, wait=160, seed=11):
    lat = Lattice(EDGES, seed_gen=seed, dtau=dtau)
    lat.set_transverse_field(GAMMA)
    es, _ = lat.run_quantum_monte_carlo_sampling(BETA, t, n, sampling_wait_buffer=wait)
    return es.mean(), es.std(ddof=1) / np.sqrt(len(es))


def test_engine_tracks_trotterized_exact_at_coarse_dtau():
    """At dtau=0.5 (L=4) the bias vs the true quantum value is -0.189 — far
    beyond MC error — and the engine must land on the *Trotterized* exact
    value, proving the estimator carries no error other than the knob's."""
    ex = dense_tfim_energy(EDGES, 0.0, GAMMA, BETA, 2)
    et4 = trotterized_energy(4)
    assert abs(et4 - ex) > 0.15  # the test has teeth
    em, se = mc_energy(0.5)
    assert abs(em - et4) < 4 * se + 0.02, (em, et4, se)
    assert abs(em - ex) > 0.1  # visibly biased, as predicted


def test_engine_converges_to_exact_at_fine_dtau():
    ex = dense_tfim_energy(EDGES, 0.0, GAMMA, BETA, 2)
    em, se = mc_energy(0.05)  # L=40: |bias| ~ 0.002
    assert abs(em - ex) < 4 * se + 0.02, (em, ex, se)
