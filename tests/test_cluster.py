"""Swendsen-Wang cluster updates (engines/classical.py:sw_cluster_update).

Round-2 addition (VERDICT.md item 5): a genuine large-move family replacing
the random-walk worm's loop-building role. Validates (a) exactness — SW alone
samples the Gibbs distribution on frustrated graphs and with longitudinal
fields (ghost-spin construction), (b) mixing — a deep-quench workload that
single-flip dynamics fail within the budget and cluster updates pass, and
(c) determinism and API wiring.
"""

import itertools

import jax.numpy as jnp
import numpy as np

from pyisingmontecarlo_tpu import ClassicIsing, Lattice
from pyisingmontecarlo_tpu.engines import classical as ce
from pyisingmontecarlo_tpu.graph import compile_graph, grid_2d_edges
from pyisingmontecarlo_tpu.rng import keys_from_seeds


def exact_stats(edges, bias, beta):
    nvars = max(max(a, b) for (a, b), _ in edges) + 1
    h = np.asarray(bias) if np.ndim(bias) else np.full(nvars, float(bias))
    ws, Es, marg = [], [], np.zeros(nvars)
    for conf in itertools.product([-1, 1], repeat=nvars):
        s = np.array(conf)
        E = sum(j * s[a] * s[b] for (a, b), j in edges) + float(h @ s)
        w = np.exp(-beta * E)
        ws.append(w)
        Es.append(E)
        marg = marg + w * s
    ws = np.array(ws)
    return float(np.dot(ws, Es) / ws.sum()), marg / ws.sum()


def _run_sw_only(edges, bias_val, beta, R=512, therm=80, nsamp=50):
    """Drive the engine with ONLY SW cluster moves (no single-spin sweeps):
    any distributional bias in the move itself cannot hide behind the other
    families. SW alone is ergodic: every bond unfreezes with probability
    >= exp(-2 beta |J|) > 0, leaving singleton clusters that flip freely."""
    cg = compile_graph(edges)
    ga = ce.device_graph(cg)
    bias = jnp.full(cg.nvars, float(bias_val), jnp.float32)
    keys = keys_from_seeds(np.arange(1, R + 1, dtype=np.uint64) * 2654435761)
    s = ce.random_states(keys, cg.nvars)
    margs = dict(
        nspin_sweeps=0, nedge_sweeps=0, nworms=0, only_basic=False,
        heatbath=False, wlen=1, nclusters=1,
    )
    beta_arr = jnp.full(therm, beta, jnp.float32)
    s, keys = ce.run_steps(ga, bias, s, keys, beta_arr, **margs)
    _, _, es, ss = ce.run_sampling(
        ga, bias, s, keys, jnp.float32(beta), nsamp, 1, **margs
    )
    return np.asarray(es, np.float64), np.asarray(ss, np.int8)


def _check(edges, bias_val, beta):
    ex_e, ex_marg = exact_stats(edges, bias_val, beta)
    es, ss = _run_sw_only(edges, bias_val, beta)
    em = es.mean()
    se = max(es.mean(axis=1).std(ddof=1) / np.sqrt(es.shape[0]), 1e-6)
    assert abs(em - ex_e) < 5 * se + 0.02, (em, ex_e, se)
    marg = ss.mean(axis=(0, 1))
    assert np.allclose(marg, ex_marg, atol=0.06), (marg, ex_marg)


def test_sw_only_exact_ferromagnet_with_field():
    # ghost-spin construction: field breaks the flip symmetry; marginals must
    # come out biased exactly as enumeration says
    edges = [((0, 1), -1.0), ((1, 2), -1.0), ((2, 3), -1.0), ((3, 0), -1.0)]
    _check(edges, bias_val=0.4, beta=0.6)


def test_sw_only_exact_frustrated_mixed_couplings():
    # frustrated triangle (one AFM bond flips sign) + pendant spin
    edges = [((0, 1), -1.0), ((1, 2), 1.0), ((0, 2), -1.0), ((2, 3), -0.5)]
    _check(edges, bias_val=-0.3, beta=0.8)


def test_sw_only_exact_negative_field_afm():
    edges = [((0, 1), 1.0), ((1, 2), 1.0), ((0, 2), 1.0)]
    _check(edges, bias_val=0.5, beta=0.9)


def test_cluster_updates_fix_deep_quench():
    """L=16 FM torus quenched to beta=1.0 from a random start. 100 sweeps of
    single-flip dynamics leave domain walls (measured |m| ~ 0.81, the round-1
    verify-smoke failure); one SW update per step orders it essentially
    completely. Same Gibbs distribution, vastly faster mixing."""
    L = 16
    edges = grid_2d_edges(L, L, j=-1.0)

    lat = Lattice(edges, seed_gen=1)
    es, ss = lat.run_monte_carlo_sampling(
        1.0, 40, 64, thermalization_time=100, sampling_freq=4
    )
    m_single = np.abs(np.where(ss, 1, -1).mean(axis=2)).mean()

    lat2 = Lattice(edges, seed_gen=1)
    lat2.set_enable_cluster_updates(True)
    es2, ss2 = lat2.run_monte_carlo_sampling(
        1.0, 40, 64, thermalization_time=100, sampling_freq=4
    )
    m_cluster = np.abs(np.where(ss2, 1, -1).mean(axis=2)).mean()

    assert m_cluster > 0.99, m_cluster
    # witness the contrast: the single-flip budget is genuinely insufficient
    assert m_single < 0.95, m_single
    # energies at beta=1.0 should be near the ground state (-2 per site)
    assert es2.mean() / (L * L) < -1.98, es2.mean() / (L * L)


def test_cluster_determinism():
    edges = [((0, 1), -1.0), ((1, 2), 1.0), ((0, 2), -1.0), ((2, 3), -0.5)]
    outs = []
    for _ in range(2):
        lat = Lattice(edges, seed_gen=99)
        lat.set_enable_cluster_updates(True)
        es, ss = lat.run_monte_carlo_sampling(0.7, 20, 16, sampling_freq=2)
        outs.append((es, ss))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_classicising_cluster_wiring():
    L = 8
    edges = grid_2d_edges(L, L, j=-1.0)
    ci = ClassicIsing(edges, num_experiments=8, seed=3)
    ci.set_enable_cluster_updates(True)
    ci.run_monte_carlo(1.0, 30)
    # quenched deep below Tc with cluster moves: ground state +-2 per site
    assert ci.get_energies().mean() / (L * L) < -1.9


def test_clone_preserves_torus_and_cluster_flag():
    """ADVICE.md round-1 high: clone() lost _torus, breaking every classical
    run on a cloned Lattice."""
    L = 8
    lat = Lattice(grid_2d_edges(L, L, j=-1.0), seed_gen=5)
    lat.set_enable_cluster_updates(True)
    c = lat.clone()
    assert c._torus == lat._torus
    assert c.enable_cluster
    es, ss = c.run_monte_carlo(0.5, 5, 4)  # raised AttributeError before fix
    assert ss.shape == (4, L * L)
