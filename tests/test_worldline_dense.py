"""Dense (roll) worldline fast path: detection + physics parity with the
generic gather path."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import Lattice
from pyisingmontecarlo_tpu.engines import worldline as wl
from pyisingmontecarlo_tpu.graph import compile_graph, grid_2d_edges
from pyisingmontecarlo_tpu.models import chain_edges
from pyisingmontecarlo_tpu.rng import keys_from_seeds


def test_detection():
    assert wl.detect_dense(compile_graph(chain_edges(6))) == ("ring", 6, -1.0)
    assert wl.detect_dense(compile_graph(grid_2d_edges(4, 4, j=0.5))) == ("torus", 4, 0.5)
    # odd ring, open chain, non-uniform J: no dense path
    assert wl.detect_dense(compile_graph(chain_edges(5))) is None
    assert wl.detect_dense(compile_graph(chain_edges(6, periodic=False))) is None
    e = chain_edges(6)
    e[0] = (e[0][0], 2.0)
    assert wl.detect_dense(compile_graph(e)) is None


def make_ensemble(edges, beta, gamma, n, seed, force_generic=False):
    cg = compile_graph(edges)
    keys = keys_from_seeds(np.arange(seed, seed + n, dtype=np.uint64))
    w = wl.WorldlineEnsemble(cg, gamma, 0.0, beta, keys, n)
    # the ensemble enables dense only on TPU backends; tests pin it explicitly
    w.dense = None if force_generic else wl.detect_dense(cg)
    return w


def test_ring_dense_matches_exact():
    edges = chain_edges(4)
    beta, gamma = 2.0, 1.0
    w = make_ensemble(edges, beta, gamma, 96, seed=0)
    assert w.dense == ("ring", 4, -1.0)
    w.timesteps(150)
    es, _ = w.timesteps_sample(250, 1)
    ex = dense_tfim_energy(edges, 0.0, gamma, beta, 4)
    se = es.std(ddof=1) / np.sqrt(len(es))
    assert abs(es.mean() - ex) < 4 * se + 0.04, (es.mean(), ex, se)


def test_torus_dense_matches_generic_statistically():
    edges = grid_2d_edges(4, 4, j=-1.0)
    beta, gamma = 1.0, 1.2
    stats = []
    for force in (False, True):
        w = make_ensemble(edges, beta, gamma, 64, seed=7, force_generic=force)
        assert (w.dense is None) == force
        w.timesteps(120)
        es, _ = w.timesteps_sample(200, 1)
        stats.append((es.mean(), es.std(ddof=1) / np.sqrt(len(es))))
    (m1, s1), (m2, s2) = stats
    assert abs(m1 - m2) < 5 * np.hypot(s1, s2) + 0.03, stats


def test_dense_via_lattice_api():
    # the public quantum path runs fine on ring graphs regardless of backend
    # (dense engages automatically on TPU; generic on CPU)
    lat = Lattice(chain_edges(8), seed_gen=0)
    lat.set_transverse_field(0.8)
    es, ss = lat.run_quantum_monte_carlo_sampling(1.0, 60, 16, sampling_wait_buffer=40)
    assert np.isfinite(es).all()
    assert ss.shape == (16, 60, 8)
    # longitudinal field on the dense path too
    lat.set_global_bias(0.4)
    es2, _ = lat.run_quantum_monte_carlo_sampling(1.0, 40, 16, sampling_wait_buffer=30)
    assert np.isfinite(es2).all()
