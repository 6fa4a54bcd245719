"""Model-family builders: structure checks + end-to-end runs."""

import numpy as np
import pytest

from pyisingmontecarlo_tpu import Lattice, models
from pyisingmontecarlo_tpu.graph import compile_graph, detect_square_torus


def test_chain():
    e = models.chain_edges(5)
    assert len(e) == 5
    assert len(models.chain_edges(5, periodic=False)) == 4
    cg = compile_graph(e)
    assert cg.nvars == 5 and cg.ncolors in (2, 3)  # odd ring needs 3


def test_square_matches_torus_detection():
    cg = compile_graph(models.square_edges(8, j=-1.0))
    assert detect_square_torus(cg) == (8, -1.0)


def test_triangular_is_frustrated():
    e = models.triangular_edges(4, j=1.0)
    cg = compile_graph(e)
    assert cg.nedges == 3 * 16
    assert cg.ncolors >= 3  # odd cycles -> not bipartite
    cg.validate()
    # AFM triangular ground state per site is -1 (2 satisfied / 1 frustrated
    # bond per site x 3 bonds/site x (1/...)): E/N = -1 for J=+1
    lat = Lattice(e, seed_gen=0)
    es, _ = lat.run_monte_carlo_annealing([(0, 0.2), (400, 4.0)], 400, 16)
    assert es.min() / 16 == pytest.approx(-16 / 16, abs=0.3)


def test_cubic():
    e = models.cubic_edges(3)
    cg = compile_graph(e)
    assert cg.nvars == 27 and cg.nedges == 3 * 27
    cg.validate()


def test_spin_glasses_reproducible():
    e1 = models.pm_j_spin_glass_edges(6, seed=3)
    e2 = models.pm_j_spin_glass_edges(6, seed=3)
    assert e1 == e2
    assert {j for _, j in e1} == {-1.0, 1.0}
    g = models.gaussian_spin_glass_edges(4, seed=1)
    js = np.array([j for _, j in g])
    assert js.std() > 0.3
    # end-to-end: glass anneals to a low-energy state
    lat = Lattice(e1, seed_gen=0)
    es, _ = lat.run_monte_carlo_annealing([(0, 0.2), (300, 3.0)], 300, 8)
    assert es.mean() < -40  # 72 bonds; decent glass states beat -40
