"""Exact worldline-enumeration tests for the generic engine's samplers.

The strongest check we have: for a tiny system the *entire* worldline
configuration space is enumerable, so the sampler's stationary distribution
can be compared against the exact Trotter distribution it is supposed to
sample — separating sampler bias from Trotter bias entirely. This is the
harness that caught the parallel-pairing ergodicity gap of the round-3
term-kink move (engines/generic._compile_term_kinks docstring): per-group
kink densities are sharp distribution observables that plain <E>-vs-dense
tests blur with slack tolerances.

Reference contract: qmcrunner.rs:94-135 (arbitrary k-local interactions).
"""

import itertools

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from pyisingmontecarlo_tpu.engines import generic as ge


def zz_diag(j):
    out = np.empty(4)
    for idx in range(4):
        out[idx] = j * (1.0 if idx & 1 else -1.0) * (1.0 if idx & 2 else -1.0)
    return out


def x_term(g):
    return np.array([0.0, -g, -g, 0.0])


def xx_mat(jx):
    m = np.zeros((4, 4))
    for a in range(4):
        m[a, a ^ 3] = -jx
    return m.reshape(-1)


def _enum(comp, nvars, Lt, ltau):
    confs = np.array(list(itertools.product([-1, 1], repeat=nvars * Lt)), np.int8)
    S = confs.reshape(-1, nvars, Lt)
    lw = np.asarray(ge.log_weight(comp, jnp.asarray(S)))
    wgt = np.exp(lw - lw.max())
    en = np.asarray(ge.total_energy(comp, jnp.asarray(S), ltau, 0.0))
    return S, wgt, float((wgt * en).sum() / wgt.sum())


def _run_sweeps(w, nsw):
    comp, ltau = w.comp, w.ltau
    g_of_l = np.arange(w.Lt) % comp.G

    @jax.jit
    def run(s, keys):
        def body(carry, _):
            s, keys = carry
            s, keys = ge.sweep(comp, s, keys, ltau, False)
            kk = (s != jnp.roll(s, -1, axis=2)).astype(jnp.float32)
            kd = jnp.stack([kk[:, :, g_of_l == g].mean() for g in range(comp.G)])
            return (s, keys), (ge.total_energy(comp, s, ltau, 0.0).mean(), kd)
        (s, keys), out = jax.lax.scan(body, (s, keys), None, length=nsw)
        return out

    es, kds = run(w.s, w.keys)
    burn = nsw // 4
    return np.asarray(es)[burn:], np.asarray(kds)[burn:]


def test_sampler_matches_exact_worldline_distribution_xx():
    """ZZ + X + XX on two sites: per-group kink densities and <E> of the full
    sweep must match exact enumeration of the worldline distribution (this is
    the configuration whose mixed pairings the one-shared-interval term-kink
    move could not reach)."""
    n, beta, gamma, jx = 2, 0.2, 0.7, 0.6
    ts = ge.TermSet(n)
    ts.add(zz_diag(-1.0), [0, 1], diagonal=True, with_offset=False)
    ts.add(x_term(gamma), [0], diagonal=False, with_offset=False)
    ts.add(x_term(gamma), [1], diagonal=False, with_offset=False)
    ts.add(xx_mat(jx), [0, 1], diagonal=False, with_offset=False)
    R = 1024
    w = ge.GenericWorldline(
        ts, beta, jax.vmap(jax.random.PRNGKey)(np.arange(R)),
        jnp.ones((R, n), jnp.int8), False,
    )
    assert w.Lt <= 8, "keep the enumeration tractable"
    S, wgt, E_trot = _enum(w.comp, n, w.Lt, w.ltau)
    g_of_l = np.arange(w.Lt) % w.comp.G
    kfull = (S != np.roll(S, -1, axis=2)).astype(float)
    kd_e = np.array([
        (kfull[:, :, g_of_l == g] * wgt[:, None, None]).sum()
        / (wgt.sum() * n * (g_of_l == g).sum())
        for g in range(w.comp.G)
    ])
    es, kds = _run_sweeps(w, 8000)
    bm = es.reshape(-1, es.shape[0] // 6).mean(1) if es.shape[0] % 6 == 0 else es
    se = max(np.asarray(bm).std(ddof=1) / np.sqrt(len(bm)), 1e-4)
    assert abs(es.mean() - E_trot) < 6 * se + 0.003, (es.mean(), E_trot, se)
    kd_s = kds.mean(0)
    for g in range(w.comp.G):
        if kd_e[g] < 1e-9:
            assert kd_s[g] < 1e-9
        else:
            assert abs(kd_s[g] - kd_e[g]) < 0.12 * kd_e[g] + 2e-4, (g, kd_s[g], kd_e[g])


def test_sampler_matches_exact_worldline_distribution_tfim():
    """Pure TFIM pair (regression guard: the G=2 baseline was exact before
    the term-kink family existed and must stay exact)."""
    n, beta, gamma = 2, 0.2, 0.7
    ts = ge.TermSet(n)
    ts.add(zz_diag(-1.0), [0, 1], diagonal=True, with_offset=False)
    ts.add(x_term(gamma), [0], diagonal=False, with_offset=False)
    ts.add(x_term(gamma), [1], diagonal=False, with_offset=False)
    R = 1024
    w = ge.GenericWorldline(
        ts, beta, jax.vmap(jax.random.PRNGKey)(np.arange(R)),
        jnp.ones((R, n), jnp.int8), False,
    )
    assert w.Lt <= 8
    S, wgt, E_trot = _enum(w.comp, n, w.Lt, w.ltau)
    es, _ = _run_sweeps(w, 6000)
    se = max(es.std(ddof=1) / np.sqrt(len(es)) * 5, 1e-4)
    assert abs(es.mean() - E_trot) < 6 * se + 0.003, (es.mean(), E_trot)
