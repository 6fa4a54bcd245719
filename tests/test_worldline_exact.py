"""Exact-physics validation of the worldline QMC engine against dense
diagonalization (SURVEY.md section 4 test strategy)."""

import numpy as np
import pytest

from helpers import dense_tfim_energy, dense_tfim_magnetization
from pyisingmontecarlo_tpu import Lattice


def qmc_energy(edges, gamma, h, beta, n=96, t=220, wait=150, seed=0):
    lat = Lattice(edges, seed_gen=seed)
    lat.set_transverse_field(gamma)
    if h:
        lat.set_global_bias(h)
    es, _ = lat.run_quantum_monte_carlo_sampling(beta, t, n, sampling_wait_buffer=wait)
    return es.mean(), es.std(ddof=1) / np.sqrt(len(es))


def test_tfim_ring_energy():
    edges = [((i, (i + 1) % 4), -1.0) for i in range(4)]
    ex = dense_tfim_energy(edges, 0.0, 1.0, 2.0, 4)
    em, se = qmc_energy(edges, 1.0, 0.0, 2.0)
    assert abs(em - ex) < 4 * se + 0.03, (em, ex, se)


def test_tfim_with_longitudinal_field():
    edges = [((0, 1), -1.0), ((1, 2), -1.0)]
    ex = dense_tfim_energy(edges, 0.4, 0.7, 1.5, 3)
    em, se = qmc_energy(edges, 0.7, 0.4, 1.5, seed=1)
    assert abs(em - ex) < 4 * se + 0.03, (em, ex, se)


def test_tfim_large_beta_energy(monkeypatch):
    """Low-temperature regime (beta = 12, L_tau ~ hundreds of slices) on the
    XLA path: the O(L log L) pointer-doubling FK clusters replaced the old
    [L, L] membership einsums (VERDICT round-2 item 10) — this run would
    need ~L^2 = 10^5 f32 per site line under the quadratic scheme. <E> must
    sit on the dense ground-state-dominated value."""
    monkeypatch.setenv("PMC_WORLDLINE_NO_PALLAS", "1")
    beta = 12.0
    edges = [((0, 1), -1.0), ((1, 2), -1.0), ((0, 2), -1.0)]
    ex = dense_tfim_energy(edges, 0.0, 0.9, beta, 3)
    em, se = qmc_energy(edges, 0.9, 0.0, beta, n=64, t=120, wait=80, seed=5)
    # Trotter bias at fixed dtau dominates the statistical error here
    assert abs(em - ex) < 4 * se + 0.06, (em, ex, se)


def test_tfim_frustrated_triangle():
    edges = [((0, 1), 1.0), ((1, 2), 1.0), ((0, 2), 1.0)]  # AFM triangle
    ex = dense_tfim_energy(edges, 0.0, 0.8, 2.0, 3)
    em, se = qmc_energy(edges, 0.8, 0.0, 2.0, seed=2)
    assert abs(em - ex) < 4 * se + 0.03, (em, ex, se)


def test_tfim_strong_field_limit():
    # Gamma >> J: E -> -nvars*Gamma*tanh(beta*Gamma)-ish; exact diag anyway
    edges = [((0, 1), -0.2)]
    ex = dense_tfim_energy(edges, 0.0, 2.0, 1.5, 2)
    em, se = qmc_energy(edges, 2.0, 0.0, 1.5, seed=3)
    assert abs(em - ex) < 4 * se + 0.05, (em, ex, se)


def test_tfim_magnetization():
    # field-polarized pair: <sz> from samples must match dense diag
    edges = [((0, 1), -1.0)]
    beta, gamma, h = 1.5, 0.6, 0.8
    mex = dense_tfim_magnetization(edges, h, gamma, beta, 2)
    lat = Lattice(edges, seed_gen=4)
    lat.set_transverse_field(gamma)
    lat.set_global_bias(h)
    es, ss = lat.run_quantum_monte_carlo_sampling(beta, 300, 128, sampling_wait_buffer=150)
    m = np.where(ss, 1.0, -1.0).mean(axis=(0, 1))
    np.testing.assert_allclose(m, mex, atol=0.05)


def test_measure_spins_moments():
    edges = [((0, 1), -1.0)]
    beta, gamma = 1.0, 1.0
    lat = Lattice(edges, seed_gen=5)
    lat.set_transverse_field(gamma)
    meas, es = lat.run_quantum_monte_carlo_and_measure_spins(beta, 200, 64)
    # exponent=1, symmetric model -> <M> ~ 0
    assert abs(meas.mean()) < 0.15
    meas2, _ = lat.run_quantum_monte_carlo_and_measure_spins(
        beta, 200, 64, exponent=2
    )
    # <M^2> in (0, nvars^2]; for the near-aligned pair it should exceed 1
    assert 0.5 < meas2.mean() <= 4.0
    # custom measurement mapping (0, 1): counts up-spins
    meas3, _ = lat.run_quantum_monte_carlo_and_measure_spins(
        beta, 200, 64, spin_measurement=(0.0, 1.0)
    )
    assert 0.0 <= meas3.mean() <= 2.0


def test_offset_and_op_counts_consistent():
    # SSE identity: <E> = offset - <n_total>/beta must hold for our
    # reinterpreted worldline op counts within error bars
    edges = [((i, (i + 1) % 4), -1.0) for i in range(4)]
    beta, gamma = 2.0, 1.0
    lat = Lattice(edges, seed_gen=6)
    lat.set_transverse_field(gamma)
    off = lat.get_offset()
    assert off == pytest.approx(4.0 + 4.0)  # sum|J| + nvars*Gamma
    d, o, c = lat.average_on_and_off_diagonal_and_consts(beta, 150, 64)
    ex = dense_tfim_energy(edges, 0.0, gamma, beta, 4)
    n_total = d + o + c
    assert abs((off - n_total / beta) - ex) < 0.35, (off, d, o, c, ex)
