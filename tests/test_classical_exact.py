"""Exact-distribution validation of the classical engine (SURVEY.md section 4):
small systems where Z, <E>, <M>, and marginals come from exhaustive
enumeration; sampler estimates must agree within Monte Carlo error."""

import itertools

import numpy as np
import pytest

from pyisingmontecarlo_tpu import Lattice


def exact_stats(edges, bias, beta):
    """Exhaustive enumeration of H = sum J s s + sum h s over s in {-1,1}^n."""
    nvars = max(max(a, b) for (a, b), _ in edges) + 1
    h = np.asarray(bias) if np.ndim(bias) else np.full(nvars, float(bias))
    Es, Ms, marg = [], [], np.zeros(nvars)
    ws = []
    for conf in itertools.product([-1, 1], repeat=nvars):
        s = np.array(conf)
        E = sum(j * s[a] * s[b] for (a, b), j in edges) + float(h @ s)
        w = np.exp(-beta * E)
        Es.append(E)
        Ms.append(abs(s.sum()))
        marg = marg + w * s
        ws.append(w)
    ws = np.array(ws)
    Z = ws.sum()
    return {
        "E": float(np.dot(ws, Es) / Z),
        "absM": float(np.dot(ws, Ms) / Z),
        "marg": marg / Z,
        "E2": float(np.dot(ws, np.square(Es)) / Z),
    }


def run_sampled(lat, beta, n=256, t=60, therm=40, **kw):
    es, ss = lat.run_monte_carlo_sampling(
        beta, t, n, thermalization_time=therm, sampling_freq=2, **kw
    )
    spins = np.where(ss, 1, -1)
    return es, spins


def check_energy(lat, edges, bias, beta, n=256, **kw):
    ex = exact_stats(edges, bias, beta)
    es, spins = run_sampled(lat, beta, n=n, **kw)
    em = es.mean()
    # std error of the estimator across replicas (replicas independent)
    se = es.mean(axis=1).std(ddof=1) / np.sqrt(es.shape[0])
    se = max(se, 1e-6)
    assert abs(em - ex["E"]) < 5 * se + 0.02, (em, ex["E"], se)
    return ex, es, spins


def test_two_spin_ferromagnet():
    edges = [((0, 1), -1.0)]
    lat = Lattice(edges, seed_gen=7)
    check_energy(lat, edges, 0.0, beta=0.7)


def test_triangle_frustrated_with_field():
    edges = [((0, 1), 1.0), ((1, 2), 1.0), ((0, 2), 1.0)]
    lat = Lattice(edges, seed_gen=3)
    lat.set_global_bias(0.3)
    check_energy(lat, edges, 0.3, beta=0.8)


def test_individual_bias_marginals():
    edges = [((0, 1), -0.5), ((1, 2), 0.5), ((2, 3), -1.0), ((0, 3), 0.25)]
    lat = Lattice(edges, seed_gen=11)
    lat.set_individual_bias(0, 1.0)
    lat.set_individual_bias(2, -0.7)
    bias = np.array([1.0, 0.0, -0.7, 0.0])
    ex = exact_stats(edges, bias, beta=0.9)
    es, spins = run_sampled(lat, 0.9, n=512, t=80, therm=60)
    marg = spins.reshape(-1, spins.shape[-1]).mean(0)
    # per-site magnetization within loose MC error
    np.testing.assert_allclose(marg, ex["marg"], atol=0.12)


def test_only_basic_moves():
    edges = [((0, 1), -1.0), ((1, 2), -1.0)]
    lat = Lattice(edges, seed_gen=5)
    check_energy(lat, edges, 0.0, beta=0.6, only_basic_moves=True)


def test_heatbath_updates():
    edges = [((0, 1), -1.0), ((1, 2), 1.0), ((0, 2), 0.4)]
    lat = Lattice(edges, seed_gen=13)
    lat.set_enable_heatbath_update(True)
    check_energy(lat, edges, 0.0, beta=0.8)


def test_deep_quench_finds_ground_state():
    # strongly coupled chain at large beta must reach a ground state
    edges = [((i, i + 1), -1.0) for i in range(7)]
    lat = Lattice(edges, seed_gen=2)
    es, ss = lat.run_monte_carlo(8.0, 200, 32)
    assert es.min() == -7.0
    assert (es == -7.0).mean() > 0.8
