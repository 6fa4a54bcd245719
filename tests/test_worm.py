"""Worm-move quality (VERDICT round-3 missing item 3 / next-round item 5).

The reference's worm family builds closed loops natively
(/root/reference/src/classicising.rs:100-106 call site); our fixed-shape walk
truncates at `wlen` steps, so closure probability is the fraction of worm
knob-turns that do anything at all. The home-biased kernel
(engines/classical._WORM_P_HOME) keeps it >= ~60% on ANY graph — a uniform
kernel manages ~1/3 on 4-regular expanders (first-return probability of a
random walk on a locally-tree-like 4-regular graph is 1/(deg-1)).
"""

import numpy as np

from pyisingmontecarlo_tpu import ClassicIsing
from pyisingmontecarlo_tpu.engines.classical import worm_closure_fraction
from pyisingmontecarlo_tpu.graph import compile_graph


def random_regular_pm_j(n, half_deg, seed):
    """Union of Hamilton cycles — the bench glass graph
    (benches/bench_classical_graph.py)."""
    rng = np.random.default_rng(seed)
    seen, edges = set(), []
    for _ in range(half_deg):
        perm = rng.permutation(n)
        for i in range(n):
            a, b = int(perm[i]), int(perm[(i + 1) % n])
            key = (min(a, b), max(a, b))
            if a != b and key not in seen:
                seen.add(key)
                edges.append(((a, b), 1.0 if rng.random() < 0.5 else -1.0))
    return edges


def test_worm_closure_on_4regular_glass():
    """>= 50% of worm proposals must close on the bench glass graph (the
    VERDICT acceptance bar); the expander geometry is the hard case."""
    cg = compile_graph(random_regular_pm_j(512, 2, seed=7))
    frac = worm_closure_fraction(cg, trials=4096, seed=1)
    assert frac >= 0.5, frac


def test_worm_closure_on_2d_torus():
    from pyisingmontecarlo_tpu.graph import grid_2d_edges

    cg = compile_graph(grid_2d_edges(16, 16, j=-1.0))
    frac = worm_closure_fraction(cg, trials=4096, seed=2)
    assert frac >= 0.5, frac


def test_worm_improves_low_T_relaxation_on_glass():
    """Mixing evidence (VERDICT round-3 item 5): quenched to beta=4 on the
    frustrated glass, steps that include worm moves must relax to lower energy
    than the same number of spin-only steps — the atomically-flipped closed
    loops escape single-flip traps mid-quench. Config calibrated at 5-6 sigma
    across seeds (gap ~0.6, se ~0.11 at R=2048); the 3-sigma assert leaves
    seed slack."""
    edges = random_regular_pm_j(96, 2, seed=3)
    beta, R, t = 4.0, 2048, 20

    def mean_energy(nworm):
        ci = ClassicIsing(edges, num_experiments=R, seed=11)
        ci.run_monte_carlo(beta, t, nspinupdates=1, nedgeupdates=0, nwormupdates=nworm)
        es, _ = ci.run_monte_carlo_sampling(
            beta, 1, nspinupdates=0, nedgeupdates=0, nwormupdates=0
        )
        return float(es.mean()), float(es.std(ddof=1) / np.sqrt(R))

    e_spin, se_spin = mean_energy(0)
    e_worm, se_worm = mean_energy(16)
    gap_se = float(np.hypot(se_spin, se_worm))
    assert e_worm < e_spin - 3 * gap_se, (e_worm, e_spin, gap_se)
