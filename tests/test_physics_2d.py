"""Known-physics tests on the 2D square lattice (SURVEY.md section 4):
Onsager magnetization and critical-region behavior of the torus fast path."""

import numpy as np
import pytest

from pyisingmontecarlo_tpu import Lattice
from pyisingmontecarlo_tpu.graph import grid_2d_edges

BETA_C = 0.44068679350977147  # ln(1+sqrt(2))/2, J=-1 ferromagnet


def onsager_m(beta):
    """Spontaneous magnetization (thermodynamic limit), beta > beta_c."""
    return (1.0 - np.sinh(2.0 * beta) ** -4) ** 0.125


def sample_mag(L, beta, n=24, therm=1500, t=60, freq=25, seed=0):
    lat = Lattice(grid_2d_edges(L, L, j=-1.0), seed_gen=seed)
    es, ss = lat.run_monte_carlo_sampling(
        beta, t, n, thermalization_time=therm, sampling_freq=freq
    )
    m = np.abs(np.where(ss, 1.0, -1.0).mean(axis=2))
    return m.mean(), m.std(ddof=1) / np.sqrt(m.size), es


def test_onsager_magnetization_ordered_phase():
    # beta = 0.48 > beta_c: 16^2 torus |m| matches Onsager within finite-size
    # corrections (exponentially small at this depth in the ordered phase)
    mexp = onsager_m(0.48)
    m, se, _ = sample_mag(16, 0.48)
    assert abs(m - mexp) < 5 * se + 0.02, (m, mexp, se)


def test_disordered_phase_magnetization_vanishes():
    m, se, _ = sample_mag(16, 0.30, therm=800)
    # |m| ~ L^-1 noise floor in the disordered phase
    assert m < 0.2, m


def onsager_u(beta):
    """Exact internal energy per site (thermodynamic limit, all beta):
    u = -coth(2b) [1 + (2/pi)(2 tanh^2(2b) - 1) K(k)], k = 2 sinh(2b)/cosh^2(2b).
    K computed by arithmetic-geometric mean."""
    k = 2.0 * np.sinh(2 * beta) / np.cosh(2 * beta) ** 2

    def ellipk(m):  # K(k) with modulus k, m = k
        a, b = 1.0, np.sqrt(1.0 - m * m)
        while abs(a - b) > 1e-15:
            a, b = (a + b) / 2.0, np.sqrt(a * b)
        return np.pi / (2.0 * a)

    return -1.0 / np.tanh(2 * beta) * (
        1.0 + (2.0 / np.pi) * (2.0 * np.tanh(2 * beta) ** 2 - 1.0) * ellipk(k)
    )


def test_energy_vs_onsager_exact():
    # off-critical betas on a 32^2 torus: finite-size corrections are below
    # the MC error, so the sampled energy per site must match the exact
    # Onsager u(beta) (measured convergence: L=12 -> 32 closes the gap)
    L = 32
    lat = Lattice(grid_2d_edges(L, L, j=-1.0), seed_gen=3)
    for beta, therm in ((0.35, 1000), (0.60, 1000)):
        es, _ = lat.run_monte_carlo_sampling(
            beta, 200, 16, thermalization_time=therm, sampling_freq=20
        )
        u = es.mean() / (L * L)
        se = es.mean(axis=1).std(ddof=1) / np.sqrt(es.shape[0]) / (L * L)
        assert abs(u - onsager_u(beta)) < 5 * se + 0.008, (beta, u, onsager_u(beta), se)


def test_binder_cumulant_ordering():
    # U4 = 1 - <m^4>/(3<m^2>^2): ~2/3 deep in the ordered phase, ~0 (Gaussian)
    # deep in the disordered phase; the crossing near beta_c is the reference
    # T_c criterion (BASELINE.md)
    def u4(L, beta):
        lat = Lattice(grid_2d_edges(L, L, j=-1.0), seed_gen=1)
        _, ss = lat.run_monte_carlo_sampling(
            beta, 100, 24, thermalization_time=1200, sampling_freq=25
        )
        mm = np.where(ss, 1.0, -1.0).mean(axis=2)
        m2 = (mm**2).mean()
        m4 = (mm**4).mean()
        return 1.0 - m4 / (3.0 * m2**2)

    assert u4(12, 0.55) > 0.6
    assert u4(12, 0.25) < 0.25
