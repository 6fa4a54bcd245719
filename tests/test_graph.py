import numpy as np
import pytest

from pyisingmontecarlo_tpu.graph import (
    compile_graph,
    detect_square_torus,
    grid_2d_edges,
    parse_edges,
)


def test_parse_edges_basic():
    nvars, ea, eb, ej = parse_edges([((0, 1), 1.0), ((1, 2), -1.0)])
    assert nvars == 3
    assert list(ea) == [0, 1]
    assert list(eb) == [1, 2]
    assert list(ej) == [1.0, -1.0]


def test_empty_edges_raises():
    # lattice.rs:69-73 parity
    with pytest.raises(ValueError):
        parse_edges([])


def test_self_loop_raises():
    with pytest.raises(ValueError):
        parse_edges([((1, 1), 1.0)])


def test_ell_adjacency_roundtrip():
    edges = [((0, 1), 1.0), ((1, 2), -2.0), ((0, 2), 0.5), ((2, 3), 3.0)]
    cg = compile_graph(edges)
    assert cg.nvars == 4
    # reconstruct edge set from ELL
    seen = set()
    for v in range(cg.nvars):
        for d in range(cg.max_deg):
            j = cg.jmat[v, d]
            if j != 0.0:
                w = int(cg.neighbors[v, d])
                seen.add((min(v, w), max(v, w), float(j)))
    want = {(min(a, b), max(a, b), j) for (a, b), j in edges}
    assert seen == want
    assert list(cg.degree) == [2, 2, 3, 1]


def test_site_coloring_proper_bipartite():
    cg = compile_graph(grid_2d_edges(6, 6))
    assert cg.ncolors == 2  # checkerboard
    cg.validate()


def test_site_coloring_proper_frustrated():
    # triangle: odd cycle, needs 3 colors
    cg = compile_graph([((0, 1), 1.0), ((1, 2), 1.0), ((0, 2), 1.0)])
    assert cg.ncolors == 3
    cg.validate()


def test_edge_coloring_proper():
    rng = np.random.default_rng(0)
    edges = []
    seen = set()
    while len(edges) < 40:
        a, b = rng.integers(0, 20, 2)
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            edges.append(((int(a), int(b)), float(rng.normal())))
    cg = compile_graph(edges)
    cg.validate()


def test_color_sites_partition():
    cg = compile_graph(grid_2d_edges(4, 4))
    allsites = np.sort(np.concatenate(cg.color_sites))
    assert np.array_equal(allsites, np.arange(cg.nvars))


def test_detect_square_torus():
    cg = compile_graph(grid_2d_edges(8, 8, j=-1.0))
    got = detect_square_torus(cg)
    assert got == (8, -1.0)
    # non-uniform J must not match
    edges = grid_2d_edges(8, 8, j=-1.0)
    edges[0] = (edges[0][0], 2.0)
    assert detect_square_torus(compile_graph(edges)) is None
    # open boundary must not match
    assert detect_square_torus(compile_graph(grid_2d_edges(8, 8, periodic=False))) is None
