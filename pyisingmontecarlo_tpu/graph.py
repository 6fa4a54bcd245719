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

All compilation products are **lazy**: uniform square tori dispatch to the
fused 2D kernels and never pay for coloring. The hot compilation passes for
large arbitrary graphs run in native C++ (native/graphc.cpp via ctypes, the
TPU-native stand-in for the reference's Rust graph layer); the numpy/python
implementations here are the reference/fallback path and the two are
cross-checked in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "CompiledGraph",
    "parse_edges",
    "compile_graph",
    "compile_graph_arrays",
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
    arr = np.array([(a, b, j) for (a, b), j in edges], dtype=np.float64)
    ea = arr[:, 0].astype(np.int64)
    eb = arr[:, 1].astype(np.int64)
    if np.any(arr[:, 0] != ea) or np.any(arr[:, 1] != eb):
        raise ValueError("Edge vertex indices must be integers")
    if (ea < 0).any() or (eb < 0).any():
        raise ValueError("Edge vertex indices must be non-negative")
    if (ea == eb).any():
        k = int(np.nonzero(ea == eb)[0][0])
        raise ValueError(f"Edge ({ea[k]}, {eb[k]}) is a self-loop")
    nvars = int(max(ea.max(), eb.max())) + 1
    return nvars, ea.astype(np.int32), eb.astype(np.int32), arr[:, 2].copy()


def _build_ell_numpy(nvars, ea, eb, ej):
    """Vectorized ELL packing (O(E log E)): both edge directions sorted by
    source vertex; position within each vertex group is the ELL slot."""
    E = len(ea)
    # interleave endpoints (a0, b0, a1, b1, ...) so slot order matches the
    # native library's edge-order packing exactly
    src = np.column_stack([ea, eb]).reshape(-1)
    dst = np.column_stack([eb, ea]).reshape(-1)
    js = np.repeat(ej, 2)
    order = np.argsort(src, kind="stable")
    ssrc = src[order]
    degree = np.bincount(src, minlength=nvars).astype(np.int32)
    max_deg = max(int(degree.max()), 1)
    starts = np.zeros(nvars + 1, dtype=np.int64)
    np.cumsum(degree, out=starts[1:])
    pos = np.arange(2 * E, dtype=np.int64) - starts[ssrc]
    neighbors = np.zeros((nvars, max_deg), dtype=np.int32)
    jmat = np.zeros((nvars, max_deg), dtype=np.float64)
    neighbors[ssrc, pos] = dst[order]
    jmat[ssrc, pos] = js[order]
    slots = np.empty(2 * E, dtype=np.int32)
    slots[order] = pos.astype(np.int32)
    return neighbors, jmat, degree, max_deg, slots[0::2].copy(), slots[1::2].copy()


def _adjacency_lists(nvars, ea, eb):
    adj = [[] for _ in range(nvars)]
    for a, b in zip(ea.tolist(), eb.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    return adj


def _color_sites_python(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Proper vertex coloring (fallback implementation for small graphs; the
    native library handles large ones). Exact 2-coloring for bipartite graphs
    (BFS), greedy largest-degree-first otherwise."""
    adj = _adjacency_lists(nvars, ea, eb)
    colors = np.full(nvars, -1, dtype=np.int32)
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
    colors[:] = -1
    order = np.argsort(-np.array([len(a) for a in adj]), kind="stable")
    for v in order:
        used = {colors[w] for w in adj[v] if colors[w] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def _strong_color_edges_python(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Greedy STRONG (distance-2) edge coloring: two edges get distinct colors
    if they share a vertex OR are joined by a bond of the graph. Within one
    class, flipping the endpoint pair of any edge leaves every other
    same-class pair's local field unchanged, so simultaneous pair updates are
    a product of independent reversible kernels. A merely *proper* edge
    coloring is NOT enough for parallel pair flips: vertex-disjoint pairs can
    still interact through a bond, and simultaneous Glauber moves with
    individually computed delta-E then bias the sampled distribution
    (caught by tests/test_edge_move_exact.py)."""
    nedges = len(ea)
    incident = [[] for _ in range(nvars)]
    for k in range(nedges):
        incident[int(ea[k])].append(k)
        incident[int(eb[k])].append(k)
    adj = _adjacency_lists(nvars, ea, eb)
    colors = np.full(nedges, -1, dtype=np.int32)
    for k in range(nedges):
        a, b = int(ea[k]), int(eb[k])
        close = {a, b}
        close.update(adj[a])
        close.update(adj[b])
        used = set()
        for v in close:
            for e2 in incident[v]:
                if colors[e2] >= 0:
                    used.add(int(colors[e2]))
        c = 0
        while c in used:
            c += 1
        colors[k] = c
    return colors


def _color_edges_python(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Greedy proper edge coloring (<= 2*max_deg - 1 classes); fallback."""
    nedges = len(ea)
    ecolors = np.full(nedges, -1, dtype=np.int32)
    incident = [[] for _ in range(nvars)]
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


def _native():
    try:
        from . import _native_graph

        return _native_graph if _native_graph.available() else None
    except Exception:
        return None


class CompiledGraph:
    """Compiled form of an edge-list graph, consumed by all engines.

    Edge arrays are materialized immediately; ELL adjacency and the two
    colorings are built lazily on first access (the 2D-torus fast path never
    needs them)."""

    def __init__(self, nvars: int, edge_a: np.ndarray, edge_b: np.ndarray, edge_j: np.ndarray):
        self.nvars = int(nvars)
        self.edge_a = np.asarray(edge_a, np.int32)
        self.edge_b = np.asarray(edge_b, np.int32)
        self.edge_j = np.asarray(edge_j, np.float64)
        self.nedges = len(self.edge_a)
        self._ell = None
        self._colors: Optional[np.ndarray] = None
        self._ecolors: Optional[np.ndarray] = None
        self._strong_ecolors: Optional[np.ndarray] = None

    # ------------------------------------------------------------------- ELL

    def _ensure_ell(self):
        if self._ell is None:
            ng = _native()
            if ng is not None:
                self._ell = ng.build_ell(self.nvars, self.edge_a, self.edge_b, self.edge_j)
            else:
                self._ell = _build_ell_numpy(self.nvars, self.edge_a, self.edge_b, self.edge_j)
        return self._ell

    @property
    def neighbors(self) -> np.ndarray:
        return self._ensure_ell()[0]

    @property
    def jmat(self) -> np.ndarray:
        return self._ensure_ell()[1]

    @property
    def degree(self) -> np.ndarray:
        return self._ensure_ell()[2]

    @property
    def max_deg(self) -> int:
        return self._ensure_ell()[3]

    @property
    def edge_slot_a(self) -> np.ndarray:
        return self._ensure_ell()[4]

    @property
    def edge_slot_b(self) -> np.ndarray:
        return self._ensure_ell()[5]

    # -------------------------------------------------------------- coloring

    @property
    def colors(self) -> np.ndarray:
        if self._colors is None:
            ng = _native()
            if ng is not None:
                self._colors = ng.color_sites(self.nvars, self.edge_a, self.edge_b)
            else:
                self._colors = _color_sites_python(self.nvars, self.edge_a, self.edge_b)
        return self._colors

    @property
    def ncolors(self) -> int:
        return int(self.colors.max()) + 1

    @property
    def color_sites(self) -> Tuple[np.ndarray, ...]:
        c = self.colors
        return tuple(np.nonzero(c == k)[0].astype(np.int32) for k in range(self.ncolors))

    @property
    def edge_colors(self) -> np.ndarray:
        if self._ecolors is None:
            ng = _native()
            if ng is not None:
                self._ecolors = ng.color_edges(self.nvars, self.edge_a, self.edge_b)
            else:
                self._ecolors = _color_edges_python(self.nvars, self.edge_a, self.edge_b)
        return self._ecolors

    @property
    def necolors(self) -> int:
        return int(self.edge_colors.max()) + 1

    @property
    def ecolor_edges(self) -> Tuple[np.ndarray, ...]:
        ec = self.edge_colors
        return tuple(np.nonzero(ec == k)[0].astype(np.int32) for k in range(self.necolors))

    @property
    def strong_edge_colors(self) -> np.ndarray:
        """Strong (distance-2) edge coloring — the one the parallel pair-flip
        move families must use (see _strong_color_edges_python)."""
        if self._strong_ecolors is None:
            ng = _native()
            if ng is not None:
                try:
                    self._strong_ecolors = ng.strong_color_edges(
                        self.nvars, self.edge_a, self.edge_b
                    )
                except AttributeError:  # stale prebuilt library
                    pass
            if self._strong_ecolors is None:
                self._strong_ecolors = _strong_color_edges_python(
                    self.nvars, self.edge_a, self.edge_b
                )
        return self._strong_ecolors

    @property
    def strong_ecolor_edges(self) -> Tuple[np.ndarray, ...]:
        ec = self.strong_edge_colors
        nc = int(ec.max()) + 1
        return tuple(np.nonzero(ec == k)[0].astype(np.int32) for k in range(nc))

    # ------------------------------------------------------------ validation

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
        # strong classes: no two same-class edges share a vertex or a bond
        adj = {(int(a), int(b)) for a, b in zip(self.edge_a, self.edge_b)}
        adj |= {(b, a) for a, b in adj}
        for eids in self.strong_ecolor_edges:
            verts = np.concatenate([self.edge_a[eids], self.edge_b[eids]])
            if len(np.unique(verts)) != len(verts):
                raise AssertionError("strong edge class shares a vertex")
            pts = list(zip(self.edge_a[eids].tolist(), self.edge_b[eids].tolist()))
            for i in range(len(pts)):
                for k in range(i + 1, len(pts)):
                    for x in pts[i]:
                        for y in pts[k]:
                            if (x, y) in adj:
                                raise AssertionError(
                                    "strong edge class joined by a bond"
                                )


def compile_graph(edges: Sequence) -> CompiledGraph:
    nvars, ea, eb, ej = parse_edges(edges)
    cg = CompiledGraph(nvars, ea, eb, ej)
    import os

    if os.environ.get("PMC_DEBUG_VALIDATE"):
        # debug mode (SURVEY.md section 5 race-detection analogue): assert
        # colored-update independence at compile time
        cg.validate()
    return cg


def compile_graph_arrays(
    nvars: int, ea: np.ndarray, eb: np.ndarray, ej: np.ndarray
) -> CompiledGraph:
    return CompiledGraph(nvars, ea, eb, ej)


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
    kernels. Pure edge-array test (no ELL/coloring needed). Returns (L, J) or
    None."""
    n = cg.nvars
    L = int(round(np.sqrt(n)))
    if L * L != n or L < 4 or L % 2 != 0:
        return None
    if cg.nedges != 2 * n:
        return None
    j0 = cg.edge_j[0]
    if not np.all(cg.edge_j == j0):
        return None
    a = cg.edge_a.astype(np.int64)
    b = cg.edge_b.astype(np.int64)
    have = np.sort(np.minimum(a, b) * n + np.maximum(a, b))
    x = np.arange(n, dtype=np.int64) // L
    y = np.arange(n, dtype=np.int64) % L
    right = ((x + 1) % L) * L + y
    down = x * L + (y + 1) % L
    v = np.arange(n, dtype=np.int64)
    want = np.concatenate(
        [np.minimum(v, right) * n + np.maximum(v, right),
         np.minimum(v, down) * n + np.maximum(v, down)]
    )
    want = np.sort(want)
    if have.shape != want.shape or not np.array_equal(have, want):
        return None
    return L, float(j0)
