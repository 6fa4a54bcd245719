"""Group-major matmul formulation of the generic k-local worldline engine.

This is the TPU fast path for ``QmcRunner``'s sweeps (reference capability:
/root/reference/src/qmcrunner.rs:94-135 arbitrary 2^k x 2^k interactions,
:142-158 update families, :161-201 sampling). The classic path
(``engines/generic.py``) evaluates transfer weights with per-(class, group)
select chains — correct, but at moderate replica counts it decomposes a sweep
into thousands of tiny XLA ops whose dispatch cost dwarfs the arithmetic
(round-3 TPU profile: 73-176 M site-sub-slice updates/s). This module
restructures the SAME updates around a handful of MXU matmuls per family:

**Layout.** The worldline ``s`` [R, n, Lt] (Lt = G * ltau sub-slices, group
``g = l % G`` active at sub-slice l) is stored as a single *group-major
plane* of bits

    gm[(g * n + v), (c * R + r)] = (s[r, v, l = g + G*c] + 1) / 2,

i.e. sublanes = (group, variable), lanes = (Trotter slab, replica). Every
term's active transfers are then a *compact contiguous row*: term t of group
g reads variables only from row block g.

**Weight evaluation = one matmul + one select chain.** With a block-diagonal
bit-weight matrix W [G*n, TT] (W[g*n + v, t] = 2^slot iff term t of group g
has v at slot), the packed state indices of ALL terms at ALL of their active
transfers are

    idx_in  = W^T @ gm            [TT, ltau*R]
    idx_out = W^T @ out(gm)

where ``out(gm)`` shifts the group axis by one block (the transfer at
l = g + G*c maps slice l to l+1 = block g+1, with the g = G-1 block wrapping
to block 0 rolled one Trotter slab). The bit weights and bits are tiny exact
integers, so the matmul is exact at any MXU precision. Per-term log-weight
columns over the union of allowed (in, out) pairs turn ``idx`` into log
weights with one ~|pairs|-deep select chain over the whole [TT, ltau*R]
plane — no gathers anywhere.

**Flip deltas = two more matmuls.** A flip of (v, l') changes transfers l'
and l'-1; with conflict coloring (at most one flipped variable per term) the
per-proposer delta is a *linear* function of the per-term deltas, i.e. an
attribution matmul: Pm/Pw [G*n, TT] for per-(variable, sub-slice) resolution
(site family), A [n, TT] row sums for whole-proposal totals (segment / line /
slice), and the term-kink phases' own attribution matrices. Attribution
matmuls run at HIGHEST precision (their values are real log-weights; a bf16
single-pass would perturb acceptance ratios).

Update composition, proposal distributions, and Glauber acceptance match
``generic.sweep`` family-for-family; tests pin site-delta and total-delta
equality against the classic path at f32 resolution and re-run the exact
diagonalization checks through this engine.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..rng import split_keys
from .classical import _uniform_per_replica
from .generic import _NEG, Compiled

_F = jnp.float32
_HI = jax.lax.Precision.HIGHEST
# Attribution matmuls sum real log-weights (values up to the +-690 _NEG
# floor). HIGH (bf16x3) carries ~f32 accuracy — error ~1e-4 absolute at the
# floor scale, orders below the 3e-4 equality tolerance vs the classic path
# and far below any physical scale — at half the MXU passes of HIGHEST
# (bf16x6). The floor terms themselves cancel exactly BEFORE the matmul
# (dlw = lw1 - lw0 elementwise), so no catastrophic cancellation rides on
# matmul precision.
_HIGH = jax.lax.Precision.HIGH


class GmHost(NamedTuple):
    """Host-side (numpy) compile of the group-major structures."""

    n: int
    G: int
    TT: int
    rows: tuple  # (class_idx, within-class term idx) per stacked row
    W: np.ndarray  # [G*n, TT] bit weights (block-diag by group)
    pairs: np.ndarray  # [P, 2] union allowed (in, out) pairs
    tabs: np.ndarray  # [TT, P] log-weight columns (_NEG off-class)
    etabs: np.ndarray  # [TT, P] energy-estimator columns (0 off-class)
    Pm: np.ndarray  # [G*n, TT] site attribution (transfer l' + l'-1, g'>0)
    Pw: np.ndarray  # [G*n, TT] site attribution wrap (l'-1 when g'=0)
    A: np.ndarray  # [n, TT] var-term incidence (whole-proposal totals)
    urow: np.ndarray  # [G*n, 1] 1.0 where variable untouched by row's group
    color_rows: tuple  # per color: [n] 0/1 f32
    # segment draw tables, padded to all n vars (0-count for other colors)
    seg_offs: tuple  # per color: [n, maxoff] int32
    seg_cnt: tuple  # per color: [n] int32
    term_rows: np.ndarray  # [nterms] stacked row of each original term id


class GmColorSub(NamedTuple):
    """Static per-color term-column subset (device tables).

    In a color-c update only terms containing a color-c variable can change
    weight (conflict coloring: everything else is untouched, dlw = 0), so the
    weight/attribution matmuls shrink to those ~|Tc| columns — for k-local
    Hamiltonians that is a constant fraction of TT per color, and together
    with the batched 4-block weight matmul this is where the round-5 sweep
    speedup comes from (the sweep is matmul-pass-bound)."""

    Tc: int  # number of subset terms (static)
    W: Optional[jax.Array]  # [G*n, Tc] bit weights
    tabs: Optional[jax.Array]  # [Tc, P] log-weight columns
    PmPw: Optional[jax.Array]  # [G*n, 2*Tc] site attribution [Pm_c | Pw_c]
    A: Optional[jax.Array]  # [n, Tc] incidence (whole-proposal totals)


class GmStructs(NamedTuple):
    """Device-side tables + the host struct (host fields are static)."""

    host: GmHost
    W: jax.Array
    tabs: jax.Array
    etabs: jax.Array
    Pm: jax.Array
    Pw: jax.Array
    A: jax.Array
    csub: Tuple[GmColorSub, ...] = ()


def compile_gm(comp: Compiled, n: int) -> GmStructs:
    G = comp.G
    rows = []
    for ci, cls in enumerate(comp.classes):
        order = np.argsort(cls.group, kind="stable")
        for j in order:
            rows.append((ci, int(j)))
    TT = len(rows)
    W = np.zeros((G * n, TT), np.float32)
    for tt, (ci, j) in enumerate(rows):
        cls = comp.classes[ci]
        g = int(cls.group[j])
        for slot in range(cls.k):
            W[g * n + int(cls.vars[j, slot]), tt] = float(1 << slot)
    pairset = set()
    for cls in comp.classes:
        for a, b in cls.pairs:
            pairset.add((int(a), int(b)))
    pairs = np.asarray(sorted(pairset), np.int32)
    tabs = np.full((TT, len(pairs)), _NEG, np.float32)
    etabs = np.zeros((TT, len(pairs)), np.float32)
    for tt, (ci, j) in enumerate(rows):
        cls = comp.classes[ci]
        lt_np = np.asarray(cls.logT[j])
        et_np = np.asarray(cls.esti[j])
        cls_pairs = {(int(a), int(b)) for a, b in cls.pairs}
        for p, (a, b) in enumerate(pairs):
            # only the term's own class pairs carry table values: a pair
            # allowed by ANOTHER class must keep the _NEG floor (mixing the
            # log-clamp floor -690 with _NEG breaks delta sums at forbidden
            # configurations against the classic path)
            if (int(a), int(b)) in cls_pairs:
                tabs[tt, p] = lt_np[a, b]
                etabs[tt, p] = et_np[a, b]
    A = np.zeros((n, TT), np.float32)
    gterm = np.zeros(TT, np.int32)
    for tt, (ci, j) in enumerate(rows):
        cls = comp.classes[ci]
        gterm[tt] = int(cls.group[j])
        for slot in range(cls.k):
            A[int(cls.vars[j, slot]), tt] = 1.0
    Pm = np.zeros((G * n, TT), np.float32)
    Pw = np.zeros((G * n, TT), np.float32)
    for gp in range(G):
        block = slice(gp * n, (gp + 1) * n)
        Pm[block] += A * (gterm == gp)[None, :]
        if gp > 0:
            Pm[block] += A * (gterm == gp - 1)[None, :]
        else:
            Pw[block] += A * (gterm == G - 1)[None, :]
    urow = (~comp.touched).T.reshape(G * n, 1).astype(np.float32)
    color_rows, seg_offs, seg_cnt = [], [], []
    for c, sites in enumerate(comp.color_sites):
        cr = np.zeros(n, np.float32)
        cr[sites] = 1.0
        color_rows.append(cr)
        offs_c = comp.kink_offs[c]
        cnt_c = comp.kink_cnt[c]
        offs = np.zeros((n, max(1, offs_c.shape[1])), np.int32)
        cnt = np.zeros(n, np.int32)
        offs[sites, : offs_c.shape[1]] = offs_c
        cnt[sites] = cnt_c
        seg_offs.append(offs)
        seg_cnt.append(cnt)
    term_rows = np.zeros(comp.nterms, np.int32)
    for tt, (ci, j) in enumerate(rows):
        term_rows[int(comp.classes[ci].term_ids[j])] = tt
    host = GmHost(
        n=n, G=G, TT=TT, rows=tuple(rows), W=W, pairs=pairs, tabs=tabs,
        etabs=etabs, Pm=Pm, Pw=Pw, A=A, urow=urow,
        color_rows=tuple(color_rows), seg_offs=tuple(seg_offs),
        seg_cnt=tuple(seg_cnt), term_rows=term_rows,
    )
    # per-color static term-column subsets: in a color-c update only terms
    # containing a color-c variable can change weight (conflict coloring), so
    # every weight/attribution matmul in that pass shrinks to these columns
    var_terms = [set() for _ in range(n)]
    for tt, (ci, j) in enumerate(rows):
        cls = comp.classes[ci]
        for slot in range(cls.k):
            var_terms[int(cls.vars[j, slot])].add(tt)
    csub = []
    for sites in comp.color_sites:
        cols_set = set()
        for v in sites:
            cols_set |= var_terms[int(v)]
        cols = np.asarray(sorted(cols_set), np.int64)
        if cols.size == 0:
            csub.append(GmColorSub(0, None, None, None, None))
        else:
            csub.append(
                GmColorSub(
                    Tc=int(cols.size),
                    W=jnp.asarray(W[:, cols]),
                    tabs=jnp.asarray(tabs[cols]),
                    PmPw=jnp.asarray(
                        np.concatenate([Pm[:, cols], Pw[:, cols]], axis=1)
                    ),
                    A=jnp.asarray(A[:, cols]),
                )
            )
    return GmStructs(
        host=host,
        W=jnp.asarray(W),
        tabs=jnp.asarray(tabs),
        etabs=jnp.asarray(etabs),
        Pm=jnp.asarray(Pm),
        Pw=jnp.asarray(Pw),
        A=jnp.asarray(A),
        csub=tuple(csub),
    )


# ------------------------------------------------------------- layout


def to_gm(s, G: int):
    """[R, n, Lt] ±1 int8 -> bit plane [(G, n), (lt, R)] f32."""
    R, n, Lt = s.shape
    lt = Lt // G
    b = (s > 0).astype(_F)  # [R, n, Lt]
    b4 = b.reshape(R, n, lt, G)
    return b4.transpose(3, 1, 2, 0).reshape(G * n, lt * R)


def from_gm(gm, G: int, n: int, R: int):
    """Bit plane [(G, n), (lt, R)] -> [R, n, Lt] ±1 int8."""
    lt = gm.shape[1] // R
    b4 = gm.reshape(G, n, lt, R).transpose(3, 1, 2, 0)  # [R, n, lt, G]
    return (b4.reshape(R, n, lt * G) * 2 - 1).astype(jnp.int8)


def _roll_slabs(x, R: int, shift: int):
    """Roll the Trotter-slab (c) axis of the (c-major, r-minor) lane dim by
    ``shift`` slabs = a plain lane roll by shift*R (kernel-safe: no reshape
    semantics beyond a static rotate)."""
    return jnp.roll(x, shift * R, axis=1)


def out_plane(gm, G: int, n: int, R: int):
    """Out-states of every transfer: block g+1's rows; block G-1 wraps to
    block 0 advanced one Trotter slab."""
    return jnp.concatenate([gm[n:], _roll_slabs(gm[:n], R, -1)], axis=0)


def _tile_rows(x, G: int):
    """[n, L] -> [G*n, L] (repeat the variable rows for every group block).

    jnp.tile lowers to broadcast + collapsing reshape — ONE fused HLO op vs
    the G-way concat it replaces (each concat materialized a full plane;
    these tiles sit on every update family's mask path)."""
    return jnp.tile(x, (G, 1))


def _tile_lanes(x, lt: int):
    """[rows, R] -> [rows, lt*R] (repeat the replica lanes for every slab)."""
    return jnp.tile(x, (1, lt))


def _sum_slabs(x, R: int):
    """[rows, lt*R] -> [rows, R]: sum over the Trotter-slab lane blocks
    (split minor dim + reduce the middle axis: one fused reduction vs lt
    slice-adds)."""
    lt = x.shape[1] // R
    return x.reshape(x.shape[0], lt, R).sum(axis=1)


def _sum_group_blocks(x, G: int, n: int):
    """[G*n, L] -> [n, L]: sum over the group row blocks."""
    return x.reshape(G, n, x.shape[1]).sum(axis=0)


# ------------------------------------------------------------- weights


def _pair_chain(gs: GmStructs, idx_in, idx_out, tabs, floor: float):
    """Select-chain lookup of per-term table columns over the union pairs."""
    lw = jnp.full(idx_in.shape, floor, _F)
    for p, (a, b) in enumerate(gs.host.pairs):
        hit = (idx_in == float(a)) & (idx_out == float(b))
        lw = jnp.where(hit, tabs[:, p : p + 1], lw)
    return lw


def lw_plane(gs: GmStructs, gm, R: int):
    """Log-weights of every term at its active transfers [TT, lt*R]."""
    h = gs.host
    gmo = out_plane(gm, h.G, h.n, R)
    idx_in = jnp.dot(gs.W.T, gm)
    idx_out = jnp.dot(gs.W.T, gmo)
    return _pair_chain(gs, idx_in, idx_out, gs.tabs, _NEG)


def _lw01_sub(gs: GmStructs, sub: GmColorSub, gm, gmn, R: int):
    """(lw0, lw1, o0, o1) over a static column subset, via ONE weight
    matmul on the lane-batched 4-block plane [gm | gmn | out(gm) | out(gmn)]
    and one pair chain over the lane-batched (in, out) halves. Exact: bit
    weights and bits are tiny integers (sums < 2^k), representable exactly at
    any MXU precision; subsetting drops only terms whose dlw is identically 0
    for the calling update family. The out-planes are returned so callers'
    _delta_plane does not rebuild them."""
    h = gs.host
    L = gm.shape[1]
    o0 = out_plane(gm, h.G, h.n, R)
    o1 = out_plane(gmn, h.G, h.n, R)
    X = jnp.concatenate([gm, gmn, o0, o1], axis=1)
    idx = jnp.dot(sub.W.T, X)  # [Tc, 4L]
    lw = _pair_chain(gs, idx[:, : 2 * L], idx[:, 2 * L :], sub.tabs, _NEG)
    return lw[:, :L], lw[:, L:], o0, o1


def _site_deltas_sub(gs: GmStructs, sub: GmColorSub, gm, m, R: int):
    """site_deltas over a per-color column subset with the combined
    [Pm_c | Pw_c] attribution matmul (HIGH precision). Returns (D, gmn)."""
    h = gs.host
    gmn = flip_bits(gm, m)
    outs = None
    if sub.Tc:
        lw0, lw1, o0, o1 = _lw01_sub(gs, sub, gm, gmn, R)
        outs = (o0, o1)
        dlw = lw1 - lw0
        D = jnp.dot(
            sub.PmPw,
            jnp.concatenate([dlw, _roll_slabs(dlw, R, +1)], axis=0),
            precision=_HIGH,
        )
    else:
        D = jnp.zeros(gm.shape, _F)
    dd = _delta_plane(gs, gm, gmn, R, outs)
    D = D + dd + _prev_rows(dd, h.G, h.n, R)
    return D, gmn


def _total_deltas_sub(gs: GmStructs, sub: GmColorSub, gm, m, R: int):
    """total_deltas over a per-color column subset. Returns (D [n, R], gmn)."""
    h = gs.host
    gmn = flip_bits(gm, m)
    outs = None
    if sub.Tc:
        lw0, lw1, o0, o1 = _lw01_sub(gs, sub, gm, gmn, R)
        outs = (o0, o1)
        dterm = jnp.dot(sub.A, lw1 - lw0, precision=_HIGH)  # [n, lt*R]
    else:
        dterm = jnp.zeros((h.n, gm.shape[1]), _F)
    dd = _delta_plane(gs, gm, gmn, R, outs)
    dv = _sum_group_blocks(dd, h.G, h.n)
    return _sum_slabs(dterm + dv, R), gmn


def _delta_plane(gs: GmStructs, gm, gmn, R: int, outs=None):
    """Per-(variable-row, transfer) delta-constraint change [G*n, lt*R]:
    _NEG * (viol_new - viol_old), nonzero only where the row's group leaves
    the variable untouched. ``outs`` = precomputed (out_plane(gm),
    out_plane(gmn)) when the caller already built them for the weight
    matmul."""
    h = gs.host
    o0, o1 = outs if outs is not None else (
        out_plane(gm, h.G, h.n, R), out_plane(gmn, h.G, h.n, R)
    )
    eq0 = gm == o0
    eq1 = gmn == o1
    dd = (eq0.astype(_F) - eq1.astype(_F)) * _NEG  # viol_new - viol_old
    return dd * jnp.asarray(h.urow)


def _prev_rows(x, G: int, n: int, R: int):
    """Attribute per-transfer values to the *following* sub-slice: transfer
    l'-1 lives at row block g'-1 (block G-1 wraps, one slab back)."""
    return jnp.concatenate(
        [_roll_slabs(x[(G - 1) * n :], R, +1), x[: (G - 1) * n]], axis=0
    )


def flip_bits(gm, m):
    """XOR of a {0,1} f32 bit plane with a {0,1} f32 mask plane."""
    return gm + m * (1.0 - 2.0 * gm)


def site_deltas(gs: GmStructs, gm, m, R: int, lw0=None):
    """Per-(variable, sub-slice) deltas [G*n, lt*R] for the flip mask ``m``
    (at most one flipped variable per term per transfer: conflict colored).
    Valid at rows/lanes where m=1. Returns (D, gmn, lw_new)."""
    h = gs.host
    if lw0 is None:
        lw0 = lw_plane(gs, gm, R)
    gmn = flip_bits(gm, m)
    lw1 = lw_plane(gs, gmn, R)
    dlw = lw1 - lw0
    D = jnp.dot(gs.Pm, dlw, precision=_HI) + jnp.dot(
        gs.Pw, _roll_slabs(dlw, R, +1), precision=_HI
    )
    dd = _delta_plane(gs, gm, gmn, R)
    D = D + dd + _prev_rows(dd, h.G, h.n, R)
    return D, gmn, lw1


def total_deltas(gs: GmStructs, gm, m, R: int, lw0=None):
    """Whole-proposal deltas per (variable, replica) [n, R] for flip mask
    ``m`` (sum over every transfer; conflict colored)."""
    h = gs.host
    if lw0 is None:
        lw0 = lw_plane(gs, gm, R)
    gmn = flip_bits(gm, m)
    lw1 = lw_plane(gs, gmn, R)
    dterm = jnp.dot(gs.A, lw1 - lw0, precision=_HI)  # [n, lt*R]
    dd = _delta_plane(gs, gm, gmn, R)
    dv = _sum_group_blocks(dd, h.G, h.n)  # [n, lt*R]
    return _sum_slabs(dterm + dv, R), gmn, lw1


# ------------------------------------------------------------- draws


def _plane_uniform(subkeys, rows: int, lt: int, R: int):
    """[G*n- or n-row, lt*R] uniforms with per-replica streams (threefry)."""
    u = _uniform_per_replica(subkeys, (rows, lt))  # [R, rows, lt]
    return u.transpose(1, 2, 0).reshape(rows, lt * R)


def _rows_uniform(subkeys, rows: int):
    """[rows, R] uniforms with per-replica streams."""
    return _uniform_per_replica(subkeys, (rows,)).T


# ------------------------------------------------------------- families


def _lsub_i32(G: int, n: int, lt: int, R: int):
    """Sub-slice index l' = g' + G*c' per (row, lane), [G*n, lt*R] int32.

    Built from traced iotas, NOT host numpy: a materialized [G*n, lt*R] plane
    embeds as an HLO literal at every use site — at n=128/R=256 that is 13 MB
    per plane and ~2 GB of HLO text per traced sweep, which is what timed out
    the round-4 hard-128 capture (rc=124 was XLA *compile* time, not runtime).
    Iotas are O(1) in the HLO and XLA fuses them into the consumers."""
    row_g = lax.broadcasted_iota(jnp.int32, (G * n, lt * R), 0) // n
    col_c = lax.broadcasted_iota(jnp.int32, (G * n, lt * R), 1) // R
    return row_g + G * col_c


def _parity_plane(G: int, n: int, lt: int, R: int, parity: int):
    """1.0 where sub-slice l' = g' + G*c' has the given parity, [G*n, lt*R]."""
    return (_lsub_i32(G, n, lt, R) % 2 == parity).astype(_F)


def _lsub_plane(G: int, n: int, lt: int, R: int):
    """Sub-slice index l' = g' + G*c' as f32, [G*n, lt*R]."""
    return _lsub_i32(G, n, lt, R).astype(_F)


def site_update_gm(gs: GmStructs, gm, subkeys, c: int, parity: int, R: int,
                   lw0=None):
    """Glauber on (color-c variable, parity-p sub-slice) positions."""
    h = gs.host
    lt = gm.shape[1] // R
    pp = _parity_plane(h.G, h.n, lt, R, parity)
    crow = _tile_rows(jnp.asarray(h.color_rows[c])[:, None], h.G)
    m = pp * crow
    if gs.csub:
        D, gmn = _site_deltas_sub(gs, gs.csub[c], gm, m, R)
    else:
        D, gmn, _ = site_deltas(gs, gm, m, R, lw0)
    u = _plane_uniform(subkeys, h.G * h.n, lt, R)
    acc = (u < jax.nn.sigmoid(D)) & (m > 0)
    gm_out = jnp.where(acc, gmn, gm)
    return gm_out


def _draw_boundary(u, offs: np.ndarray, cnt: np.ndarray, G: int, lt: int):
    """Map uniforms [n, R] to kink-capable sub-slice boundaries: j ~ U[0,
    cnt*lt); l = offs[j % cnt] + G * (j // cnt). Rows with cnt=0 return 0."""
    safe = np.maximum(cnt, 1).astype(np.float32)[:, None]
    j = jnp.floor(u * (safe * lt)).astype(jnp.int32)
    j = jnp.minimum(j, (safe * lt).astype(jnp.int32) - 1)
    within = j % jnp.asarray(np.maximum(cnt, 1))[:, None]
    slab = j // jnp.asarray(np.maximum(cnt, 1))[:, None]
    base = jnp.zeros_like(j)
    for o in range(offs.shape[1]):
        base = jnp.where(within == o, jnp.asarray(offs[:, o : o + 1]), base)
    return (base + G * slab).astype(_F)


def _interval_mask(gs: GmStructs, l1, ln, lt: int, R: int):
    """Flip mask [G*n, lt*R] for per-(variable, replica) intervals
    [l1, l1+ln) in sub-slice space (cyclic)."""
    h = gs.host
    Lt = float(h.G * lt)
    lplane = jnp.asarray(_lsub_plane(h.G, h.n, lt, R))
    L1 = _tile_rows(_tile_lanes(l1, lt), h.G)
    LN = _tile_rows(_tile_lanes(ln, lt), h.G)
    diff = lplane - L1
    diff = jnp.where(diff < 0, diff + Lt, diff)
    return (diff < LN).astype(_F)


def segment_update_gm(gs: GmStructs, gm, subkeys, R: int):
    """Segment flips (kink-pair creation/annihilation), colors sequential."""
    h = gs.host
    lt = gm.shape[1] // R
    Lt = float(h.G * lt)
    for c in range(len(h.color_rows)):
        subkeys, k1 = split_keys(subkeys)
        u = _uniform_per_replica(k1, (h.n, 3))  # [R, n, 3]
        u1, u2, u3 = (u[:, :, i].T for i in range(3))  # each [n, R]
        offs, cnt = h.seg_offs[c], h.seg_cnt[c]
        l1 = _draw_boundary(u1, offs, cnt, h.G, lt)
        l2 = _draw_boundary(u2, offs, cnt, h.G, lt)
        ln = l2 - l1
        ln = jnp.where(ln < 0, ln + Lt, ln)
        valid = jnp.asarray((cnt > 0).astype(np.float32))[:, None]
        crow = jnp.asarray(h.color_rows[c])[:, None]
        vsel = jnp.broadcast_to(valid * crow, (h.n, lt * R))
        m = _interval_mask(gs, l1, ln, lt, R) * _tile_rows(vsel, h.G)
        if gs.csub:
            D, gmn = _total_deltas_sub(gs, gs.csub[c], gm, m, R)
        else:
            D, gmn, _ = total_deltas(gs, gm, m, R)
        acc = (u3 < jax.nn.sigmoid(D)).astype(_F) * valid * crow
        gm = jnp.where(_tile_rows(_tile_lanes(acc, lt), h.G) * m > 0, gmn, gm)
    return gm, subkeys


def line_update_gm(gs: GmStructs, gm, subkeys, c: int, R: int):
    """Full-worldline flips of color-c variables."""
    h = gs.host
    lt = gm.shape[1] // R
    crow = jnp.asarray(h.color_rows[c])[:, None]
    m = _tile_rows(jnp.broadcast_to(crow, (h.n, lt * R)), h.G)
    if gs.csub:
        D, gmn = _total_deltas_sub(gs, gs.csub[c], gm, m, R)
    else:
        D, gmn, _ = total_deltas(gs, gm, m, R)
    u = _rows_uniform(subkeys, h.n)
    acc = (u < jax.nn.sigmoid(D)).astype(_F) * crow
    return jnp.where(_tile_rows(_tile_lanes(acc, lt), h.G) * m > 0, gmn, gm)


def slice_update_gm(gs: GmStructs, gm, subkeys, c: int, R: int):
    """Per-Trotter-slice flips (do_loop_updates family): color-c variables
    flipped across all G sub-slices of one random Trotter slab per replica."""
    h = gs.host
    lt = gm.shape[1] // R
    keys, ksel = split_keys(subkeys)
    tau = jax.vmap(lambda k: jax.random.randint(k, (), 0, lt))(ksel)  # [R]
    cc = jnp.tile(jnp.repeat(jnp.arange(lt), R).reshape(1, lt * R), (1, 1))
    in_slab = (cc == jnp.tile(tau, lt)[None, :]).astype(_F)  # [1, lt*R]
    crow = jnp.asarray(h.color_rows[c])[:, None]
    m = _tile_rows(crow * in_slab, h.G)
    if gs.csub:
        D, gmn = _total_deltas_sub(gs, gs.csub[c], gm, m, R)
    else:
        D, gmn, _ = total_deltas(gs, gm, m, R)
    u = _rows_uniform(keys, h.n)
    acc = (u < jax.nn.sigmoid(D)).astype(_F) * crow
    return jnp.where(_tile_rows(_tile_lanes(acc, lt), h.G) * m > 0, gmn, gm)


def free_var_update_gm(gs: GmStructs, gm, subkeys, free_vars: np.ndarray,
                       R: int):
    """Uniform resample of variables in no term (constant worldlines)."""
    if free_vars.shape[0] == 0:
        return gm
    h = gs.host
    lt = gm.shape[1] // R
    rs = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (h.n,)))(subkeys)
    bits = rs.astype(_F).T  # [n, R]
    frow = np.zeros((h.n, 1), np.float32)
    frow[free_vars] = 1.0
    m = _tile_rows(_tile_lanes(bits, lt) * jnp.asarray(frow), h.G)
    sel = _tile_rows(jnp.broadcast_to(jnp.asarray(frow), (h.n, lt * R)), h.G)
    return jnp.where(sel > 0, m, gm)


# ---------------------------------------------------------- term kinks


class GmKinkPhase(NamedTuple):
    """One conflict-free term-kink phase in gm form (host numpy + the static
    per-phase column subset as device tables: only terms attributed by Satt
    have nonzero dP — everything else multiplies by zero — so the weight
    matmuls shrink to those columns, same trick as GmColorSub)."""

    P: int
    kmax: int
    pgroup: np.ndarray  # [P]
    soffs: np.ndarray  # [P, kmax, maxoff]
    scnt: np.ndarray  # [P, kmax]
    pact: np.ndarray  # [P, kmax] bool
    S: tuple  # per slot: [n, P] var<-proposal incidence (f32)
    Satt: np.ndarray  # [P, TT] term-delta attribution (f32)
    sub: Optional[GmColorSub] = None  # W/tabs column subset (A/PmPw unused)
    Satt_sub: Optional[jax.Array] = None  # [P, Tc] Satt restricted to sub


def compile_gm_kinks(comp: Compiled, gs: GmStructs) -> Tuple[GmKinkPhase, ...]:
    h = gs.host
    out = []
    for tc in comp.tkink:
        P, kmax = tc.pvars.shape
        S = []
        for slot in range(kmax):
            Ss = np.zeros((h.n, P), np.float32)
            for p in range(P):
                if tc.pact[p, slot]:
                    Ss[int(tc.pvars[p, slot]), p] = 1.0
            S.append(Ss)
        Satt = np.zeros((P, h.TT), np.float32)
        # tc.att is per class: (class-local term idx, attributed proposal)
        row_of = {}
        for tt, (ci, j) in enumerate(h.rows):
            row_of[(ci, j)] = tt
        for ci, (selc, pidx) in enumerate(tc.att):
            for j, p in zip(selc, pidx):
                Satt[int(p), row_of[(ci, int(j))]] = 1.0
        cols = np.nonzero(Satt.any(axis=0))[0]
        sub = Satt_sub = None
        if cols.size:
            sub = GmColorSub(
                Tc=int(cols.size),
                W=jnp.asarray(h.W[:, cols]),
                tabs=jnp.asarray(h.tabs[cols]),
                PmPw=None,
                A=None,
            )
            Satt_sub = jnp.asarray(Satt[:, cols])
        out.append(
            GmKinkPhase(
                P=P, kmax=kmax, pgroup=tc.pgroup, soffs=tc.soffs,
                scnt=tc.scnt, pact=tc.pact, S=tuple(S), Satt=Satt,
                sub=sub, Satt_sub=Satt_sub,
            )
        )
    return tuple(out)


def term_kink_update_gm(gs: GmStructs, kinks, gm, subkeys, R: int):
    """Term-kink flips (multi-variable off-diagonal ergodicity), phases
    sequential; matches generic.term_kink_update proposal geometry."""
    h = gs.host
    lt = gm.shape[1] // R
    Lt = float(h.G * lt)
    for ph in kinks:
        subkeys, k1 = split_keys(subkeys)
        u = _uniform_per_replica(k1, (ph.P, ph.kmax + 2))  # [R, P, kmax+2]
        slab_t = jnp.minimum((u[:, :, 0] * lt).astype(jnp.int32), lt - 1)
        t = (jnp.asarray(ph.pgroup)[None, :] + 1 + h.G * slab_t) % int(Lt)
        t = t.astype(_F).T  # [P, R]
        m_total = jnp.zeros(gm.shape, _F)
        lw0_full = lw_plane(gs, gm, R) if ph.sub is None else None
        for slot in range(ph.kmax):
            cnt = np.maximum(ph.scnt[:, slot], 1)
            cap = (cnt * lt).astype(np.float32)[:, None]
            j = jnp.minimum(
                (u[:, :, slot + 1].T * cap).astype(jnp.int32),
                cap.astype(jnp.int32) - 1,
            )  # [P, R]
            within = j % jnp.asarray(cnt)[:, None]
            slab = j // jnp.asarray(cnt)[:, None]
            base = jnp.zeros_like(j)
            offs = ph.soffs[:, slot, :]
            for o in range(offs.shape[1]):
                base = jnp.where(
                    within == o, jnp.asarray(offs[:, o : o + 1]), base
                )
            a = (base + h.G * slab).astype(_F)  # [P, R]
            ln = t - a
            ln = jnp.where(ln < 0, ln + Lt, ln)
            act = jnp.asarray(ph.pact[:, slot].astype(np.float32))[:, None]
            # broadcast (a, ln) from proposal space to variable rows
            Ss = jnp.asarray(ph.S[slot])
            a_v = jnp.dot(Ss, a * act, precision=_HI)  # [n, R]
            ln_v = jnp.dot(Ss, ln * act, precision=_HI)
            m_total = jnp.maximum(
                m_total, _interval_mask(gs, a_v, ln_v, lt, R)
            )
        gmn = flip_bits(gm, m_total)
        if ph.sub is not None:
            lw0, lw1, _, _ = _lw01_sub(gs, ph.sub, gm, gmn, R)
            dP = jnp.dot(ph.Satt_sub, lw1 - lw0, precision=_HIGH)
        else:
            lw1 = lw_plane(gs, gmn, R)
            dP = jnp.dot(
                jnp.asarray(ph.Satt), lw1 - lw0_full, precision=_HI
            )  # [P, lt*R]
        D = _sum_slabs(dP, R)  # [P, R]
        acc = (u[:, :, ph.kmax + 1].T < jax.nn.sigmoid(D)).astype(_F)
        # broadcast acceptance to variable rows (slots are disjoint vars)
        acc_v = jnp.zeros((h.n, R), _F)
        for slot in range(ph.kmax):
            acc_v = jnp.maximum(
                acc_v, jnp.dot(jnp.asarray(ph.S[slot]), acc, precision=_HI)
            )
        gm = jnp.where(
            _tile_rows(_tile_lanes(acc_v, lt), h.G) * m_total > 0, gmn, gm
        )
    return gm, subkeys


# ------------------------------------------------------------- energy


def energy_gm(gs: GmStructs, gm, R: int, ltau: int, offset: float):
    """dlnZ/dbeta estimator: per-replica mean over Trotter slices of the
    summed per-term (M T / T) values."""
    h = gs.host
    gmo = out_plane(gm, h.G, h.n, R)
    idx_in = jnp.dot(gs.W.T, gm)
    idx_out = jnp.dot(gs.W.T, gmo)
    ev = _pair_chain(gs, idx_in, idx_out, gs.etabs, 0.0)  # [TT, lt*R]
    col = jnp.sum(ev, axis=0, keepdims=True)  # [1, lt*R]
    return offset + _sum_slabs(col, R)[0] / ltau  # [R]


def term_op_counts_gm(gs: GmStructs, gm, R: int, ltau: int, beta, offsets):
    """Per-term SSE op-count analogue [R, nterms]: beta * (C_t - <H_t>)."""
    h = gs.host
    gmo = out_plane(gm, h.G, h.n, R)
    idx_in = jnp.dot(gs.W.T, gm)
    idx_out = jnp.dot(gs.W.T, gmo)
    ev = _pair_chain(gs, idx_in, idx_out, gs.etabs, 0.0)  # [TT, lt*R]
    per_term = _sum_slabs(ev, R) / ltau  # [TT, R]
    rows = jnp.asarray(gs.host.term_rows)
    ev_t = jnp.take(per_term, rows, axis=0).T  # [R, nterms]
    return beta * (jnp.asarray(offsets)[None, :] - ev_t)


# -------------------------------------------------------------- sweep


def sweep_gm(gs: GmStructs, kinks, comp: Compiled, gm, keys, R: int,
             do_loop: bool):
    """One full sweep in gm layout; family composition matches
    generic.sweep (site x colors x parities, segment passes, term-kink
    passes, line flips, optional slice flips, free-variable resample)."""
    from .generic import N_SEGMENT_PASSES, N_TERMKINK_PASSES

    h = gs.host
    ncolors = len(h.color_rows)
    for c in range(ncolors):
        for parity in (0, 1):
            keys, sub = split_keys(keys)
            gm = site_update_gm(gs, gm, sub, c, parity, R)
    for _ in range(N_SEGMENT_PASSES):
        keys, sub = split_keys(keys)
        gm, _ = segment_update_gm(gs, gm, sub, R)
    if kinks:
        for _ in range(N_TERMKINK_PASSES):
            keys, sub = split_keys(keys)
            gm, _ = term_kink_update_gm(gs, kinks, gm, sub, R)
    for c in range(ncolors):
        keys, sub = split_keys(keys)
        gm = line_update_gm(gs, gm, sub, c, R)
    if do_loop:
        for c in range(ncolors):
            keys, sub = split_keys(keys)
            gm = slice_update_gm(gs, gm, sub, c, R)
    keys, sub = split_keys(keys)
    gm = free_var_update_gm(gs, gm, sub, comp.free_vars, R)
    return gm, keys


# ------------------------------------------------- table detachment
#
# The gm tables (W/tabs/etabs/Pm/Pw/A + the per-color and per-kink-phase
# column subsets) scale as G*n*TT — ~28 MB EACH at n=416 on the hard family.
# Closed over a jit they embed as HLO *literals*, and the serialized compile
# request (hundreds of MB) exceeds remote-compile transport limits (the axon
# tunnel rejects it with HTTP 413; any PJRT path still pays proto bloat and
# per-compile constant folding). GenericWorldline therefore detaches them:
# the skeletons keep only static host structure (array slots -> None, so a
# stale use fails loudly), and the concrete arrays travel as a flat tuple of
# *runtime jit arguments*, rebound to the skeleton inside the trace. Compile
# payload becomes O(1) in table size; the arrays stay resident on device
# across calls (no transfer cost).


def detach_tables(gs: GmStructs, kinks=()):
    """Split (gs, kinks) into array-free skeletons + a flat device-array
    tuple. Rebind inside the jitted driver with ``rebind_tables``."""
    arrs = [gs.W, gs.tabs, gs.etabs, gs.Pm, gs.Pw, gs.A]
    csub = []
    for sub in gs.csub:
        if sub.Tc:
            arrs += [sub.W, sub.tabs, sub.PmPw, sub.A]
            csub.append(sub._replace(W=None, tabs=None, PmPw=None, A=None))
        else:
            csub.append(sub)
    gs_skel = gs._replace(
        W=None, tabs=None, etabs=None, Pm=None, Pw=None, A=None,
        csub=tuple(csub),
    )
    kinks_skel = []
    for ph in kinks:
        if ph.sub is not None:
            arrs += [ph.sub.W, ph.sub.tabs, ph.Satt_sub]
            ph = ph._replace(
                sub=ph.sub._replace(W=None, tabs=None), Satt_sub=None
            )
        kinks_skel.append(ph)
    return gs_skel, tuple(kinks_skel), tuple(arrs)


def rebind_tables(gs: GmStructs, kinks, arrs):
    """Inverse of ``detach_tables`` under a trace: graft the (traced) array
    tuple back onto the skeletons."""
    it = iter(arrs)
    gs = gs._replace(
        W=next(it), tabs=next(it), etabs=next(it), Pm=next(it),
        Pw=next(it), A=next(it),
    )
    csub = []
    for sub in gs.csub:
        if sub.Tc:
            sub = sub._replace(
                W=next(it), tabs=next(it), PmPw=next(it), A=next(it)
            )
        csub.append(sub)
    gs = gs._replace(csub=tuple(csub))
    kinks2 = []
    for ph in kinks:
        if ph.sub is not None:
            ph = ph._replace(
                sub=ph.sub._replace(W=next(it), tabs=next(it)),
                Satt_sub=next(it),
            )
        kinks2.append(ph)
    return gs, tuple(kinks2)


# ----------------------------------------------------- jitted drivers
#
# Same contract as generic.run_sweeps / run_sweeps_sample /
# run_sweeps_bond_sample, but the whole scan runs in gm layout: the [R, n, Lt]
# worldline converts to the bit plane once on entry and back once on exit
# (two transposes amortized over `timesteps` sweeps). The leading ``tables``
# argument is the detached device-array tuple (see detach_tables above).


def _slice0_pm1(gm, n: int, R: int):
    """Classical sample at Trotter slice l=0 (group 0, slab 0) as ±1 int8
    [R, n] — matches generic.run_sweeps_sample's ``s[:, :, 0]`` payload."""
    return (gm[:n, :R].T * 2.0 - 1.0).astype(jnp.int8)


def run_sweeps_gm(gs, kinks, comp, tables, s, keys, timesteps, ltau, do_loop,
                  offset):
    from ..utils.accum import kadd, kzero

    gs, kinks = rebind_tables(gs, kinks, tables)
    R = s.shape[0]
    h = gs.host
    gm = to_gm(s, h.G)

    def body(carry, _):
        gm, keys, esum = carry
        gm, keys = sweep_gm(gs, kinks, comp, gm, keys, R, do_loop)
        return (gm, keys, kadd(esum, energy_gm(gs, gm, R, ltau, offset))), None

    (gm, keys, esum), _ = lax.scan(
        body, (gm, keys, kzero(R)), None, length=timesteps
    )
    return from_gm(gm, h.G, h.n, R), keys, esum


def run_sweeps_sample_gm(gs, kinks, comp, tables, s, keys, timesteps,
                         sampling_freq, ltau, do_loop, offset):
    from ..utils.accum import kadd, kzero

    gs, kinks = rebind_tables(gs, kinks, tables)
    R = s.shape[0]
    h = gs.host
    gm = to_gm(s, h.G)
    nsamples = timesteps // sampling_freq

    def block(carry, _):
        gm, keys, esum = carry
        for _ in range(sampling_freq):
            gm, keys = sweep_gm(gs, kinks, comp, gm, keys, R, do_loop)
            esum = kadd(esum, energy_gm(gs, gm, R, ltau, offset))
        return (gm, keys, esum), _slice0_pm1(gm, h.n, R)

    (gm, keys, esum), samples = lax.scan(
        block, (gm, keys, kzero(R)), None, length=nsamples
    )
    rem = timesteps - nsamples * sampling_freq
    for _ in range(rem):
        gm, keys = sweep_gm(gs, kinks, comp, gm, keys, R, do_loop)
        esum = kadd(esum, energy_gm(gs, gm, R, ltau, offset))
    return (
        from_gm(gm, h.G, h.n, R), keys, esum, jnp.swapaxes(samples, 0, 1)
    )


def run_sweeps_bond_sample_gm(gs, kinks, comp, tables, s, keys, timesteps,
                              sampling_freq, ltau, do_loop, offset,
                              offsets_t, beta):
    from ..utils.accum import kadd, kzero

    gs, kinks = rebind_tables(gs, kinks, tables)
    R = s.shape[0]
    h = gs.host
    gm = to_gm(s, h.G)
    nsamples = timesteps // sampling_freq

    def block(carry, _):
        gm, keys, esum = carry
        for _ in range(sampling_freq):
            gm, keys = sweep_gm(gs, kinks, comp, gm, keys, R, do_loop)
            esum = kadd(esum, energy_gm(gs, gm, R, ltau, offset))
        return (gm, keys, esum), term_op_counts_gm(
            gs, gm, R, ltau, beta, offsets_t
        )

    (gm, keys, esum), samples = lax.scan(
        block, (gm, keys, kzero(R)), None, length=nsamples
    )
    return (
        from_gm(gm, h.G, h.n, R), keys, esum, jnp.swapaxes(samples, 0, 1)
    )


# PMC_GENERIC_GM: "auto" (default) gates on table footprint, "1" forces the
# gm path, "0" forces the classic select-chain path. The dominant tables are
# the [G*n, TT] attribution/bit-weight matrices (W, Pm, Pw) plus the
# [TT, lt*R] planes each matmul materializes; PMC_GM_MAX caps G*n*TT. The
# matmul work scales as G*n*TT (quadratic in system size for local
# Hamiltonians, where the classic path is linear) — the footprint cap is
# also the arithmetic crossover guard. Env is read at construction time,
# not import time, so notebook users can flip it between runners.


def gm_eligible(comp: Compiled, n: int) -> bool:
    """Whether GenericWorldline should run its sweeps on the gm path."""
    mode = os.environ.get("PMC_GENERIC_GM", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    gm_max = int(os.environ.get("PMC_GM_MAX", str(8 * 1024 * 1024)))
    return comp.G * n * comp.nterms <= gm_max
