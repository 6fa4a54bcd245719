"""Parallel edge-pair flips must use the STRONG (distance-2) edge coloring.

Round-2 regression: with a merely *proper* edge coloring, two vertex-disjoint
pairs in one class can interact through a bond; flipping them simultaneously
with individually computed delta-E violates detailed balance and biased the
sampled energy by ~25% on a 6x6 torus (round-1 bug, caught while tightening
tests/test_classicising_torus.py). These tests pin (a) exactness of the
spin+edge composition against enumeration and (b) the strong-coloring
invariant itself, cross-checking the native C++ pass against the python one.
"""

import itertools

import jax.numpy as jnp
import numpy as np

from pyisingmontecarlo_tpu.engines import classical as ce
from pyisingmontecarlo_tpu.graph import (
    _strong_color_edges_python,
    compile_graph,
    grid_2d_edges,
)
from pyisingmontecarlo_tpu.rng import keys_from_seeds


def exact_energy(edges, bias, beta):
    nvars = max(max(a, b) for (a, b), _ in edges) + 1
    h = np.full(nvars, float(bias))
    ws, Es = [], []
    for conf in itertools.product([-1, 1], repeat=nvars):
        s = np.array(conf)
        E = sum(j * s[a] * s[b] for (a, b), j in edges) + float(h @ s)
        ws.append(np.exp(-beta * E))
        Es.append(E)
    ws = np.array(ws)
    return float(np.dot(ws, Es) / ws.sum())


def _run_spin_edge(edges, bias_val, beta, R=512, therm=120, nsamp=60):
    cg = compile_graph(edges)
    ga = ce.device_graph(cg)
    bias = jnp.full(cg.nvars, float(bias_val), jnp.float32)
    keys = keys_from_seeds(np.arange(1, R + 1, dtype=np.uint64) * 7919)
    s = ce.random_states(keys, cg.nvars)
    margs = dict(
        nspin_sweeps=1, nedge_sweeps=1, nworms=0, only_basic=False,
        heatbath=False, wlen=1, nclusters=0,
    )
    s, keys = ce.run_steps(ga, bias, s, keys, jnp.full(therm, beta, jnp.float32), **margs)
    _, _, es, _ = ce.run_sampling(ga, bias, s, keys, jnp.float32(beta), nsamp, 1, **margs)
    return np.asarray(es, np.float64)


def test_spin_edge_exact_small_torus():
    # 4x4 periodic FM torus: the smallest case with bond-adjacent disjoint
    # pairs, where the proper-coloring version is measurably biased
    edges = grid_2d_edges(4, 4, j=-1.0)
    ex = exact_energy(edges, 0.0, 0.35)
    es = _run_spin_edge(edges, 0.0, 0.35)
    em = es.mean()
    se = max(es.mean(axis=1).std(ddof=1) / np.sqrt(es.shape[0]), 1e-6)
    assert abs(em - ex) < 5 * se + 0.05, (em, ex, se)


def test_spin_edge_exact_frustrated_with_field():
    edges = [((0, 1), 1.0), ((1, 2), 1.0), ((0, 2), 1.0), ((2, 3), -1.0), ((3, 4), 1.0)]
    ex = exact_energy(edges, 0.25, 0.8)
    es = _run_spin_edge(edges, 0.25, 0.8)
    em = es.mean()
    se = max(es.mean(axis=1).std(ddof=1) / np.sqrt(es.shape[0]), 1e-6)
    assert abs(em - ex) < 5 * se + 0.05, (em, ex, se)


def _assert_strong(cg, ecolors):
    """No two same-class edges share a vertex or are joined by a bond."""
    bonds = {(int(a), int(b)) for a, b in zip(cg.edge_a, cg.edge_b)}
    bonds |= {(b, a) for a, b in bonds}
    nc = int(ecolors.max()) + 1
    for c in range(nc):
        ids = np.nonzero(ecolors == c)[0]
        pts = list(zip(cg.edge_a[ids].tolist(), cg.edge_b[ids].tolist()))
        seen = set()
        for a, b in pts:
            assert a not in seen and b not in seen, "shared vertex in strong class"
            seen.add(a)
            seen.add(b)
        for i in range(len(pts)):
            for k in range(i + 1, len(pts)):
                for x in pts[i]:
                    for y in pts[k]:
                        assert (x, y) not in bonds, "bond inside strong class"


def test_strong_coloring_valid_and_native_matches_python():
    rng = np.random.default_rng(42)
    cases = [grid_2d_edges(6, 6, j=-1.0)]
    # random graphs of varying density
    for n, E in [(12, 20), (30, 70), (9, 36)]:
        pairs = set()
        while len(pairs) < E:
            a, b = rng.integers(0, n, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        cases.append([((a, b), float(rng.normal())) for a, b in sorted(pairs)])
    for edges in cases:
        cg = compile_graph(edges)
        _assert_strong(cg, cg.strong_edge_colors)
        _assert_strong(
            cg, _strong_color_edges_python(cg.nvars, cg.edge_a, cg.edge_b)
        )


def test_device_graph_uses_strong_classes():
    cg = compile_graph(grid_2d_edges(6, 6, j=-1.0))
    ga = ce.device_graph(cg)
    assert len(ga.e_a) == len(cg.strong_ecolor_edges)
    assert sum(int(x.shape[0]) for x in ga.e_a) == cg.nedges


def test_importance_sampled_edge_moves_exact():
    """enable_edge_importance_sampling (lattice.rs:200): |J|-weighted attempt
    gating is a state-independent (symmetric) proposal, so the sampled
    distribution must match exact enumeration on a heterogeneous graph."""
    edges = [
        ((0, 1), -2.0), ((1, 2), -0.5), ((2, 3), -1.0),
        ((3, 0), -0.25), ((0, 2), 1.5),
    ]
    beta = 0.6
    cg = compile_graph(edges)
    ga = ce.device_graph(cg)
    iw = ce.importance_weights(cg)
    # weights really are heterogeneous (the gate is exercised)
    allw = np.concatenate([np.asarray(w) for w in iw])
    assert allw.min() < 0.99 and allw.max() == 1.0
    bias = jnp.zeros(cg.nvars, jnp.float32)
    R = 1024
    keys = keys_from_seeds(np.arange(1, R + 1, dtype=np.uint64) * 104729)
    s = ce.random_states(keys, cg.nvars)
    margs = dict(
        nspin_sweeps=1, nedge_sweeps=2, nworms=0, only_basic=False,
        heatbath=False, wlen=1, nclusters=0, iw=iw,
    )
    s, keys = ce.run_steps(ga, bias, s, keys, jnp.full(150, beta, jnp.float32), **margs)
    _, _, es, _ = ce.run_sampling(ga, bias, s, keys, jnp.float32(beta), 80, 1, **margs)
    es = np.asarray(es, np.float64)
    ex = exact_energy(edges, 0.0, beta)
    em, se = es.mean(), es.mean(1).std(ddof=1) / np.sqrt(R)
    assert abs(em - ex) < 5 * se + 0.02, (em, ex, se)


def test_edge_sweep_stale_field_corrections_match_fresh_matmuls():
    """The one-matmul-per-sweep edge path (VERDICT round-3 item 3: the old
    scheme re-read the [n, n] coupling matrix once per strong-edge class)
    corrects the sweep-start fields with ELL gathers of the flip delta. On an
    integer-J graph every addend is a small exact-in-f32 integer, so the
    corrected fields — and hence every acceptance decision — must match the
    fresh-matmul-per-class path BIT-EXACTLY over a multi-sweep trajectory."""
    import jax.numpy as jnp

    from pyisingmontecarlo_tpu.engines import classical as ce
    from pyisingmontecarlo_tpu.graph import compile_graph
    from pyisingmontecarlo_tpu.rng import MasterRng, keys_from_seeds, split_keys

    rng = np.random.default_rng(5)
    n = 48
    edges = []
    seen = set()
    for _ in range(3):  # ~6-regular random multigraph-free +-J glass
        perm = rng.permutation(n)
        for i in range(n):
            a, b = int(perm[i]), int(perm[(i + 1) % n])
            key = (min(a, b), max(a, b))
            if a != b and key not in seen:
                seen.add(key)
                edges.append(((a, b), 1.0 if rng.random() < 0.5 else -1.0))
    cg = compile_graph(edges)
    ga = ce.device_graph_sorted(cg, dense=True)
    assert ga.A_hi is not None and len(ga.e_a) > 1
    R, beta = 32, 1.3
    keys = keys_from_seeds(MasterRng(9).make_seeds(R))
    s = ce.random_states(keys, n).T  # site-major

    def sweep(s, keys, stale):
        s0 = B0 = None
        if stale:
            s0, B0 = s, ce._dense_field(ga, s)
        for c in range(len(ga.e_a)):
            keys, sub = split_keys(keys)
            s = ce._edge_color_update(
                ga, jnp.zeros(n), s, sub, beta, c, False, s0=s0, B0=B0
            )
        return s, keys

    s1, k1 = s, keys
    s2, k2 = s, keys
    for _ in range(4):
        s1, k1 = sweep(s1, k1, stale=True)
        s2, k2 = sweep(s2, k2, stale=False)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
