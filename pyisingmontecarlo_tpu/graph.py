"""Graph compilation: edge lists -> padded adjacency + conflict-free colorings.

This is the foundation layer of the TPU-native rebuild. The reference
(/root/reference/src/lattice.rs:45-74) parses ``edges = [((a, b), J), ...]``,
infers ``nvars = max vertex index + 1`` (lattice.rs:51-55) and raises
``ValueError`` on an empty edge list (lattice.rs:69-73). The reference then
hands the raw edge list to a sequential Rust engine; on TPU we instead compile
the graph once into dense, statically-shaped arrays that every kernel consumes:

- **ELL adjacency**: ``neighbors[nvars, max_deg]`` / ``jmat[nvars, max_deg]``
  (zero-padded couplings so padded slots contribute nothing to local fields).
- **Site coloring**: partition of vertices into independence classes so that
  all sites of one color can do simultaneous Metropolis updates with local
  delta-E (checkerboard generalized to arbitrary graphs). Bipartite graphs get
  an exact 2-coloring via BFS; general graphs get greedy largest-degree-first.
- **Edge coloring**: proper edge coloring (no two edges of one class share a
  vertex) enabling conflict-free parallel pair-flip ("edge move") updates.

A native C++ implementation of the hot compilation passes lives in
``native/graphc.cpp`` (loaded via ctypes); the numpy implementation here is the
reference/fallback path and the two are cross-checked in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import numpy as np

__all__ = [
    "CompiledGraph",
    "parse_edges",
    "compile_graph",
    "grid_2d_edges",
    "detect_square_torus",
]


def parse_edges(edges: Sequence) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """Parse ``[((a, b), J), ...]`` into arrays; mirrors lattice.rs:45-74 checks.

    Returns ``(nvars, edge_a, edge_b, edge_j)``. Raises ``ValueError`` for an
    empty edge list (lattice.rs:69-73), negative indices, or self-loops.
    """
    if len(edges) == 0:
        raise ValueError("Must supply some edges for graph")
    ea = np.empty(len(edges), dtype=np.int32)
    eb = np.empty(len(edges), dtype=np.int32)
    ej = np.empty(len(edges), dtype=np.float64)
    for i, ((a, b), j) in enumerate(edges):
        a = int(a)
        b = int(b)
        if a < 0 or b < 0:
            raise ValueError(f"Edge ({a}, {b}) has a negative vertex index")
        if a == b:
            raise ValueError(f"Edge ({a}, {b}) is a self-loop")
        ea[i] = a
        eb[i] = b
        ej[i] = float(j)
    nvars = int(max(ea.max(), eb.max())) + 1
    return nvars, ea, eb, ej


def _build_ell(nvars: int, ea: np.ndarray, eb: np.ndarray, ej: np.ndarray):
    """Pack the (undirected) edge list into ELL adjacency with zero-padding."""
    degree = np.zeros(nvars, dtype=np.int32)
    np.add.at(degree, ea, 1)
    np.add.at(degree, eb, 1)
    max_deg = max(int(degree.max()), 1)
    neighbors = np.zeros((nvars, max_deg), dtype=np.int32)
    jmat = np.zeros((nvars, max_deg), dtype=np.float64)
    # edge slot of each endpoint (edge k occupies slot edge_slot_a[k] of vertex ea[k])
    edge_slot_a = np.zeros(len(ea), dtype=np.int32)
    edge_slot_b = np.zeros(len(eb), dtype=np.int32)
    fill = np.zeros(nvars, dtype=np.int32)
    for k in range(len(ea)):
        a, b, j = int(ea[k]), int(eb[k]), ej[k]
        sa, sb = fill[a], fill[b]
        neighbors[a, sa] = b
        jmat[a, sa] = j
        neighbors[b, sb] = a
        jmat[b, sb] = j
        edge_slot_a[k] = sa
        edge_slot_b[k] = sb
        fill[a] = sa + 1
        fill[b] = sb + 1
    return neighbors, jmat, degree, max_deg, edge_slot_a, edge_slot_b


def _adjacency_lists(nvars, ea, eb):
    adj = [[] for _ in range(nvars)]
    for a, b in zip(ea.tolist(), eb.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    return adj


def _color_sites(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Proper vertex coloring. Exact 2-coloring for bipartite graphs (BFS),
    greedy largest-degree-first otherwise. Isolated vertices get color 0."""
    adj = _adjacency_lists(nvars, ea, eb)
    colors = np.full(nvars, -1, dtype=np.int32)
    # BFS bipartite attempt
    bipartite = True
    for s in range(nvars):
        if colors[s] >= 0:
            continue
        colors[s] = 0
        stack = [s]
        while stack and bipartite:
            v = stack.pop()
            for w in adj[v]:
                if colors[w] < 0:
                    colors[w] = 1 - colors[v]
                    stack.append(w)
                elif colors[w] == colors[v]:
                    bipartite = False
                    break
        if not bipartite:
            break
    if bipartite:
        return colors
    # greedy largest-degree-first
    colors[:] = -1
    order = np.argsort(-np.array([len(a) for a in adj]), kind="stable")
    for v in order:
        used = {colors[w] for w in adj[v] if colors[w] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def _color_edges(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Greedy proper edge coloring (<= 2*max_deg - 1 classes)."""
    nedges = len(ea)
    ecolors = np.full(nedges, -1, dtype=np.int32)
    incident = [[] for _ in range(nvars)]  # edge ids per vertex
    for k in range(nedges):
        incident[int(ea[k])].append(k)
        incident[int(eb[k])].append(k)
    for k in range(nedges):
        used = set()
        for v in (int(ea[k]), int(eb[k])):
            for e2 in incident[v]:
                if ecolors[e2] >= 0:
                    used.add(int(ecolors[e2]))
        c = 0
        while c in used:
            c += 1
        ecolors[k] = c
    return ecolors


@dataclass(frozen=True)
class CompiledGraph:
    """Immutable compiled form of an edge-list graph, consumed by all engines."""

    nvars: int
    nedges: int
    max_deg: int
    edge_a: np.ndarray  # [nedges] int32
    edge_b: np.ndarray  # [nedges] int32
    edge_j: np.ndarray  # [nedges] f64
    neighbors: np.ndarray  # [nvars, max_deg] int32 (padded with 0)
    jmat: np.ndarray  # [nvars, max_deg] f64 (padded with 0.0)
    degree: np.ndarray  # [nvars] int32
    colors: np.ndarray  # [nvars] int32
    ncolors: int
    color_sites: Tuple[np.ndarray, ...]  # per color: sorted site indices
    edge_colors: np.ndarray  # [nedges] int32
    necolors: int
    ecolor_edges: Tuple[np.ndarray, ...]  # per edge color: edge ids
    edge_slot_a: np.ndarray  # [nedges] slot of edge within ELL row of a
    edge_slot_b: np.ndarray

    def validate(self) -> None:
        """Debug assertion: colorings are proper (SURVEY.md section 5, race
        detection analogue — colored-update independence check)."""
        ca = self.colors[self.edge_a]
        cb = self.colors[self.edge_b]
        if np.any(ca == cb):
            raise AssertionError("site coloring is not proper")
        for eids in self.ecolor_edges:
            verts = np.concatenate([self.edge_a[eids], self.edge_b[eids]])
            if len(np.unique(verts)) != len(verts):
                raise AssertionError("edge coloring is not proper")


def compile_graph(edges: Sequence) -> CompiledGraph:
    nvars, ea, eb, ej = parse_edges(edges)
    return compile_graph_arrays(nvars, ea, eb, ej)


def compile_graph_arrays(
    nvars: int, ea: np.ndarray, eb: np.ndarray, ej: np.ndarray
) -> CompiledGraph:
    try:
        from . import _native_graph as ng

        neighbors, jmat, degree, max_deg, slot_a, slot_b = ng.build_ell(nvars, ea, eb, ej)
        colors = ng.color_sites(nvars, ea, eb)
        ecolors = ng.color_edges(nvars, ea, eb)
    except Exception:  # native lib absent/unbuilt: numpy fallback
        neighbors, jmat, degree, max_deg, slot_a, slot_b = _build_ell(nvars, ea, eb, ej)
        colors = _color_sites(nvars, ea, eb)
        ecolors = _color_edges(nvars, ea, eb)
    ncolors = int(colors.max()) + 1 if nvars else 1
    color_sites = tuple(
        np.nonzero(colors == c)[0].astype(np.int32) for c in range(ncolors)
    )
    necolors = int(ecolors.max()) + 1
    ecolor_edges = tuple(
        np.nonzero(ecolors == c)[0].astype(np.int32) for c in range(necolors)
    )
    return CompiledGraph(
        nvars=nvars,
        nedges=len(ea),
        max_deg=max_deg,
        edge_a=ea,
        edge_b=eb,
        edge_j=ej,
        neighbors=neighbors,
        jmat=jmat,
        degree=degree,
        colors=colors,
        ncolors=ncolors,
        color_sites=color_sites,
        edge_colors=ecolors,
        necolors=necolors,
        ecolor_edges=ecolor_edges,
        edge_slot_a=slot_a,
        edge_slot_b=slot_b,
    )


def grid_2d_edges(lx: int, ly: int, j: float = -1.0, periodic: bool = True):
    """Convenience: square-lattice edge list (vertex id = x * ly + y)."""
    edges = []
    for x in range(lx):
        for y in range(ly):
            v = x * ly + y
            if periodic or x + 1 < lx:
                edges.append(((v, ((x + 1) % lx) * ly + y), j))
            if periodic or y + 1 < ly:
                edges.append(((v, x * ly + (y + 1) % ly), j))
    return edges


def detect_square_torus(cg: CompiledGraph):
    """Detect whether the compiled graph is exactly an LxL periodic square
    lattice with uniform coupling, for dispatch to the fused 2D fast-path
    kernel. Returns (L, J) or None."""
    n = cg.nvars
    L = int(round(np.sqrt(n)))
    if L * L != n or L < 4 or L % 2 != 0:
        return None
    if cg.nedges != 2 * n:
        return None
    j0 = cg.edge_j[0]
    if not np.all(cg.edge_j == j0):
        return None
    want = set()
    for x in range(L):
        for y in range(L):
            v = x * L + y
            want.add((min(v, ((x + 1) % L) * L + y), max(v, ((x + 1) % L) * L + y)))
            want.add((min(v, x * L + (y + 1) % L), max(v, x * L + (y + 1) % L)))
    have = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(cg.edge_a, cg.edge_b)
    }
    if have != want:
        return None
    return L, float(j0)
