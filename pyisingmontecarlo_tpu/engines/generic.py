"""Generic k-local-interaction worldline QMC engine (QmcRunner backend).

TPU-native replacement for the reference's ``qmc::sse::Qmc`` (generic SSE over
arbitrary k-local terms; contract reconstructed in SURVEY.md section 2.3 from
/root/reference/src/qmcrunner.rs call sites). SSE samples an operator string of
term applications; on TPU we instead Trotterize:

    e^{-beta H} ~ [ prod_g e^{-dtau H_g} ]^{L_tau},   H = sum_t H_t,

where the terms are partitioned into G **disjoint-support groups** (greedy
coloring of the term-overlap graph — terms inside a group commute and act on
disjoint variables). The imaginary-time axis then has ``Lt = L_tau * G``
sub-slices; the transfer at sub-slice ``l`` applies group ``g = l % G``:

    W = prod_l [ prod_{t in g(l)} T_t[idx_in, idx_out] ]
             * prod_{v untouched by g(l)} delta(s_v,l , s_v,l+1)

with ``T_t = expm(-dtau M_t)`` a dense 2^k x 2^k table per term. Everything is
statically shaped: terms are batched by **arity class** (all k-local terms in
one [T_k, 2^k, 2^k] table + [T_k, k] variable lists), transfer evaluation is
pure gathers, and updates are conflict-free colored Metropolis flips:

- single-site sub-slice flips, colored by (term-co-occurrence coloring) x
  (sub-slice parity) — delta constraints reject automatically via the weight;
- full-worldline single-variable flips (delta-free; unfreezes variables whose
  off-diagonal dynamics is weak), always accepted for variables in no term;
- segment flips of one variable between its kink-capable transfers
  (1-local off-diagonal kink creation/annihilation);
- **term-kink flips**: a multi-variable term's full off-diagonal mask pattern
  flipped over a tau-interval bounded by that term's own transfers — the only
  move that can populate an XX/XXX-style term's antidiagonal (its paired
  kinks are unreachable by single-variable moves, whose intermediates carry
  1-bit mismatches of weight ~ e^-690; see _compile_term_kinks);
- per-Trotter-slice variable flips when ``do_loop_updates`` is set (the
  reference's loop-update family analogue, qmcrunner.rs:142-150).

Energy estimator: E = <sum_t (M_t T_t / T_t)[in, out]> averaged per Trotter
slice (the dlnZ/dbeta estimator), plus the accumulated constant offset from
``add_*_and_offset``.

Sign condition: weights must be non-negative, i.e. T_t >= 0 elementwise —
guaranteed for stoquastic M_t (off-diagonal <= 0). For 1-local terms with
positive off-diagonal (e.g. +Gamma sigma^x), each variable's periodic
worldline flips an even number of times, so the element signs cancel exactly
and |T| sampling is exact (same argument as the TFIM engine). Other
sign-indefinite terms raise ValueError — the same fundamental sign-problem
boundary the reference's SSE weights have.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..rng import split_keys
from ..utils.accum import kadd, kfinal, kzero
from .classical import _uniform_per_replica

__all__ = ["TermSet", "GenericWorldline", "expm", "DEFAULT_DTAU"]

_F = jnp.float32
_S = jnp.int8
_NEG = -1.0e9  # log-weight of a forbidden configuration
# Coarser default than the TFIM engine: generic kink dynamics relies on
# segment flips whose acceptance ~ (offdiag * dtau)^2, and Trotter bias at
# 0.1 stays well below the statistical tolerances of the workloads.
DEFAULT_DTAU = 0.1
N_SEGMENT_PASSES = 6  # segment-flip passes per sweep (kink-number mixing)
N_TERMKINK_PASSES = 4  # term-kink passes per sweep (multi-var off-diag mixing)


def expm(m: np.ndarray) -> np.ndarray:
    """Matrix exponential via scaling-and-squaring + Taylor (tiny matrices)."""
    m = np.asarray(m, np.float64)
    norm = np.abs(m).sum(axis=-1).max() if m.size else 0.0
    sq = max(0, int(math.ceil(math.log2(max(norm, 1e-30)))) + 1) if norm > 0.5 else 0
    a = m / (2.0**sq)
    out = np.eye(m.shape[0]) + a
    term = a.copy()
    for k in range(2, 24):
        term = term @ a / k
        out = out + term
    for _ in range(sq):
        out = out @ out
    return out


class TermSet:
    """Host-side registry of k-local interaction terms."""

    def __init__(self, nvars: int):
        self.nvars = nvars
        self.terms: List[dict] = []  # {mat (2^k,2^k) np, vars tuple, offset}
        self.offset = 0.0

    def add(self, mat_flat, nvars_list, diagonal: bool, with_offset: bool) -> None:
        """qmcrunner.rs:94-135 semantics: flattened 2^k x 2^k (or 2^k diagonal)
        matrix over the listed variables; ``with_offset`` shifts the matrix to
        make the SSE/worldline weights non-negative and records the constant."""
        vs = [int(v) for v in nvars_list]
        k = len(vs)
        if k == 0:
            raise ValueError("Interaction must touch at least one variable")
        if len(set(vs)) != k:
            raise ValueError("Interaction variables must be distinct")
        for v in vs:
            if v < 0 or v >= self.nvars:
                raise ValueError(f"Interaction variable {v} out of bounds")
        dim = 2**k
        mat_flat = np.asarray(mat_flat, np.float64)
        if diagonal:
            if mat_flat.shape != (dim,):
                raise ValueError(
                    f"Diagonal interaction on {k} variables needs {dim} entries, "
                    f"got {mat_flat.shape}"
                )
            mat = np.diag(mat_flat)
        else:
            if mat_flat.shape != (dim * dim,):
                raise ValueError(
                    f"Interaction on {k} variables needs {dim * dim} entries, "
                    f"got {mat_flat.shape}"
                )
            mat = mat_flat.reshape(dim, dim)
        off = 0.0
        if with_offset:
            # shift so the diagonal (hence the SSE weight C - H) is non-negative
            c = float(mat.diagonal().max())
            if c > 0:
                mat = mat - c * np.eye(dim)
                off = c
        offdiag = mat - np.diag(np.diag(mat))
        if k > 1 and offdiag.max() > 1e-12:
            raise ValueError(
                "Multi-variable interaction has positive off-diagonal elements "
                "(non-stoquastic: sign problem). Use the stoquastic form or an "
                "offset variant."
            )
        self.offset += off
        self.terms.append(dict(mat=mat, vars=tuple(vs), offset=off))

    def clone(self) -> "TermSet":
        other = TermSet(self.nvars)
        other.terms = [dict(t) for t in self.terms]
        other.offset = self.offset
        return other


class ArityClass(NamedTuple):
    """Statically-shaped batch of all k-local terms for one arity k.

    Index structures are host numpy (compile-time constants closed over the
    per-instance jitted drivers); only the weight tables are device arrays."""

    k: int
    vars: np.ndarray  # [T, k] int32
    logT: jax.Array  # [T, 2^k, 2^k] f32 (log weights; _NEG where T ~ 0)
    esti: jax.Array  # [T, 2^k, 2^k] f32 ((M T)/T energy estimator table)
    group: np.ndarray  # [T] int32
    cvar: Tuple[np.ndarray, ...]  # per color: [T] var of that color in term, or -1
    term_ids: np.ndarray  # [T] original term indices (for bond counts)
    diag_only: bool = False  # every term in the class is diagonal (ZZ-style)
    # (in, out) index pairs allowed (non-floor log-weight) for ANY term of the
    # class — the select chain in _term_logw only visits these (host const)
    pairs: np.ndarray = np.zeros((0, 2), np.int32)


class TermKinkColor(NamedTuple):
    """One conflict-free phase of term-kink proposals (see term_kink_update).

    A proposal is a (multi-variable term, off-diagonal flip mask) pair; two
    proposals conflict when some term touches variables of both (their
    acceptance weights would not be separable). All arrays are host numpy
    compile-time constants."""

    pvars: np.ndarray  # [P, kmax] int32 var ids (inactive slots padded)
    pact: np.ndarray  # [P, kmax] bool: slot carries a flipped variable
    pgroup: np.ndarray  # [P] int32 group of the proposing term
    # per (proposal, slot): that variable's kink-capable sub-slice offsets
    # modulo G ([P, kmax, maxoff] padded with 0) and counts ([P, kmax]) — the
    # independent second boundary each flipped variable draws for itself
    soffs: np.ndarray
    scnt: np.ndarray
    # per arity class: (class-local term indices whose weight a proposal of
    # this color can change, the proposal index each is attributed to)
    att: Tuple[Tuple[np.ndarray, np.ndarray], ...]


class Compiled(NamedTuple):
    classes: Tuple[ArityClass, ...]
    touched: np.ndarray  # [nvars, G] bool
    free_vars: np.ndarray  # [nF] vars in no term
    color_sites: Tuple[np.ndarray, ...]
    G: int
    nterms: int
    # segment-flip proposal tables: per color, kink-capable sub-slice offsets
    # modulo G ([Cc, maxoffs] padded with 0) and their counts ([Cc]); a
    # variable's worldline can only change across transfers whose group
    # contains a term acting off-diagonally on it
    kink_offs: Tuple[np.ndarray, ...]
    kink_cnt: Tuple[np.ndarray, ...]
    # [nvars, G] bool: kink of variable v allowed across transfers of group g
    kinkable: np.ndarray
    # term-kink proposal phases (multi-variable off-diagonal ergodicity)
    tkink: Tuple[TermKinkColor, ...]


def _color_conflicts(nvars: int, terms: List[dict]) -> np.ndarray:
    """Vertex coloring of the variable co-occurrence graph (vars sharing a
    term must be in different classes)."""
    from ..graph import _color_sites_python

    pairs = set()
    for t in terms:
        vs = t["vars"]
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                pairs.add((min(vs[i], vs[j]), max(vs[i], vs[j])))
    if not pairs:
        return np.zeros(nvars, np.int32)
    ea = np.array([p[0] for p in pairs], np.int32)
    eb = np.array([p[1] for p in pairs], np.int32)
    return _color_sites_python(nvars, ea, eb)


def _group_terms(terms: List[dict]) -> np.ndarray:
    """Greedy disjoint-support grouping (terms in a group share no variable)."""
    groups = np.full(len(terms), -1, np.int32)
    used: List[set] = []
    for i, t in enumerate(terms):
        vs = set(t["vars"])
        for g, occupied in enumerate(used):
            if not (vs & occupied):
                groups[i] = g
                occupied |= vs
                break
        else:
            groups[i] = len(used)
            used.append(set(vs))
    return groups


def compile_terms(nvars: int, terms: List[dict], dtau: float) -> Compiled:
    if not terms:
        raise ValueError("No interactions added")
    groups = _group_terms(terms)
    G = int(groups.max()) + 1
    colors = _color_conflicts(nvars, terms)
    ncolors = int(colors.max()) + 1
    color_sites = tuple(
        np.nonzero(colors == c)[0].astype(np.int32) for c in range(ncolors)
    )
    touched = np.zeros((nvars, G), bool)
    in_any = np.zeros(nvars, bool)
    offdiag_groups = [set() for _ in range(nvars)]  # groups that can kink v
    for t, g in zip(terms, groups):
        m = t["mat"]
        dim = m.shape[0]
        for slot, v in enumerate(t["vars"]):
            touched[v, g] = True
            in_any[v] = True
            bit = 1 << slot
            # off-diagonal action on v: any matrix element between states
            # differing in v's bit (expm can only couple what M couples
            # through powers, which preserves "which bits can flip" per term)
            if any(
                abs(m[a, a ^ bit]) > 1e-12 or abs(m[a ^ bit, a]) > 1e-12
                for a in range(dim)
            ) or any(
                abs(m[a, b]) > 1e-12
                for a in range(dim)
                for b in range(dim)
                if (a ^ b) & bit and a != b
            ):
                offdiag_groups[v].add(int(g))
    by_k: Dict[int, List[int]] = {}
    for i, t in enumerate(terms):
        by_k.setdefault(len(t["vars"]), []).append(i)
    classes = []
    for k, ids in sorted(by_k.items()):
        T = len(ids)
        vs = np.zeros((T, k), np.int32)
        logT = np.zeros((T, 2**k, 2**k), np.float64)
        esti = np.zeros((T, 2**k, 2**k), np.float64)
        for j, i in enumerate(ids):
            m = terms[i]["mat"]
            vs[j] = terms[i]["vars"]
            tm = expm(-dtau * m)
            if tm.min() < -1e-9:
                if k == 1:
                    tm = np.abs(tm)  # even-flip-parity sign cancellation (exact)
                else:
                    raise ValueError(
                        "Interaction produces negative path weights (sign problem)"
                    )
            tm = np.maximum(tm, 1e-300)
            logT[j] = np.log(tm)
            # clip: at forbidden transitions (tm ~ 1e-300) the ratio can
            # exceed f32 range; those entries are never realized (weight
            # e^-690) but the one-hot contraction multiplies them by 0.0,
            # and 0 * inf would poison the sum with NaN
            esti[j] = np.clip((m @ tm) / tm, -1e30, 1e30)
        cvar = []
        for c in range(ncolors):
            cv = np.full(T, -1, np.int32)
            for j, i in enumerate(ids):
                for slot, v in enumerate(terms[i]["vars"]):
                    if colors[v] == c:
                        cv[j] = v
            cvar.append(cv)
        diag_only = all(
            np.abs(terms[i]["mat"] - np.diag(np.diag(terms[i]["mat"]))).max() < 1e-12
            for i in ids
        )
        # allowed (in, out) pairs: above the clamp floor for some term
        floor = float(np.log(1e-300)) + 1.0
        allowed = (logT > floor).any(axis=0)  # [2^k, 2^k]
        pairs = np.argwhere(allowed).astype(np.int32)
        classes.append(
            ArityClass(
                k=k,
                vars=vs,
                logT=jnp.asarray(logT, _F),
                esti=jnp.asarray(esti, _F),
                group=groups[ids],
                cvar=tuple(cvar),
                term_ids=np.asarray(ids),
                diag_only=diag_only,
                pairs=pairs,
            )
        )
    kink_offs, kink_cnt = [], []
    for sites in color_sites:
        maxoffs = max([1] + [len(offdiag_groups[v]) for v in sites])
        offs = np.zeros((len(sites), maxoffs), np.int32)
        cnt = np.zeros(len(sites), np.int32)
        for j, v in enumerate(sites):
            # capable segment boundaries: sub-slice l with group(l-1) kinkable,
            # i.e. l  ==  (g+1) mod G  (mod G, repeated every Trotter slice)
            gs = sorted((g + 1) % G for g in offdiag_groups[v])
            cnt[j] = len(gs)
            offs[j, : len(gs)] = gs
        kink_offs.append(offs)
        kink_cnt.append(cnt)
    kinkable = np.zeros((nvars, G), bool)
    for v in range(nvars):
        for g in offdiag_groups[v]:
            kinkable[v, g] = True
    tkink = _compile_term_kinks(nvars, terms, groups, by_k, dtau, offdiag_groups)
    return Compiled(
        classes=tuple(classes),
        touched=touched,
        free_vars=np.nonzero(~in_any)[0].astype(np.int32),
        color_sites=color_sites,
        G=G,
        nterms=len(terms),
        kink_offs=tuple(kink_offs),
        kink_cnt=tuple(kink_cnt),
        kinkable=kinkable,
        tkink=tkink,
    )


def _compile_term_kinks(
    nvars, terms, groups, by_k, dtau, offdiag_groups
) -> Tuple[TermKinkColor, ...]:
    """Build the term-kink proposal phases.

    A transfer of a multi-variable off-diagonal term (e.g. an XX bond, whose
    T = cosh I + sinh A only connects a -> a and a -> a^3) can never be
    crossed by single-variable moves: any 1-bit mismatch across it has weight
    ~ e^-690, so site/segment/line flips leave the sampler confined to the
    diagonal sector of every such transfer — the SSE analogue inserts whole
    term applications and has no such barrier. The fix is a move with one
    **common boundary** at a transfer of the term's group (where all mask
    variables toggle jointly, entering the term's antidiagonal) and an
    **independent second boundary per variable**, drawn from that variable's
    own kink-capable positions. The independent boundaries are essential:
    flipping every mask variable over the *same* interval (the obvious move)
    only reaches parallel pairings — a configuration where one variable
    rebalances its kink parity at its own X transfer while its partner
    rebalances elsewhere is separated from parallel pairings by forbidden
    single-mismatch intermediates, and its weight (~ tanh^3 vs tanh^2) showed
    up as a reproducible 20-25% kink-density deficit against exact worldline
    enumeration. Proposals are compiled one per (term, mask); conflict
    coloring (some term touches variables of both proposals) makes each
    phase's parallel Glauber acceptances exactly separable."""
    props: List[Tuple[Tuple[int, ...], int]] = []  # (flipped vars, group)
    for i, t in enumerate(terms):
        k = len(t["vars"])
        if k < 2:
            continue
        tm = expm(-dtau * t["mat"])
        dim = 2**k
        masks = sorted(
            {
                a ^ b
                for a in range(dim)
                for b in range(dim)
                if a != b and abs(tm[a, b]) > 1e-14
            }
        )
        for mvar in masks:
            vs = tuple(t["vars"][slot] for slot in range(k) if (mvar >> slot) & 1)
            props.append((vs, int(groups[i])))
    if not props:
        return ()
    var_terms = [set() for _ in range(nvars)]
    for i, t in enumerate(terms):
        for v in t["vars"]:
            var_terms[v].add(i)
    pterms = []  # terms whose weight proposal p can change
    for vs, _ in props:
        ts = set()
        for v in vs:
            ts |= var_terms[v]
        pterms.append(ts)
    # greedy color: p ~ q iff pterms[p] & pterms[q] (shared affected term)
    colors = np.full(len(props), -1, np.int32)
    color_union: List[set] = []
    for p in range(len(props)):
        for c, occ in enumerate(color_union):
            if not (pterms[p] & occ):
                colors[p] = c
                occ |= pterms[p]
                break
        else:
            colors[p] = len(color_union)
            color_union.append(set(pterms[p]))
    class_ids = {k: ids for k, ids in sorted(by_k.items())}  # class order
    out = []
    G = int(groups.max()) + 1
    for c in range(int(colors.max()) + 1):
        sel = np.nonzero(colors == c)[0]
        kmax = max(len(props[p][0]) for p in sel)
        maxoff = max(
            [1] + [len(offdiag_groups[v]) for p in sel for v in props[p][0]]
        )
        pvars = np.zeros((len(sel), kmax), np.int32)
        pact = np.zeros((len(sel), kmax), bool)
        pgroup = np.zeros(len(sel), np.int32)
        soffs = np.zeros((len(sel), kmax, maxoff), np.int32)
        scnt = np.ones((len(sel), kmax), np.int32)
        var_prop = {}  # var id -> proposal index within this color
        for j, p in enumerate(sel):
            vs, g = props[p]
            pgroup[j] = g
            for slot, v in enumerate(vs):
                pvars[j, slot] = v
                pact[j, slot] = True
                var_prop[v] = j
                gs = sorted((gg + 1) % G for gg in offdiag_groups[v])
                scnt[j, slot] = len(gs)
                soffs[j, slot, : len(gs)] = gs
        att = []
        for k, ids in class_ids.items():
            selc, pidx = [], []
            for jc, i in enumerate(ids):
                owners = {var_prop[v] for v in terms[i]["vars"] if v in var_prop}
                if owners:
                    assert len(owners) == 1, "conflict coloring violated"
                    selc.append(jc)
                    pidx.append(owners.pop())
            att.append((np.asarray(selc, np.int32), np.asarray(pidx, np.int32)))
        out.append(
            TermKinkColor(
                pvars=pvars, pact=pact, pgroup=pgroup,
                soffs=soffs, scnt=scnt, att=tuple(att),
            )
        )
    return tuple(out)


def regrid_worldline(s_old, comp_new: Compiled, Lt_new: int) -> np.ndarray:
    """Resample worldlines [R, nvars, Lt_old] onto a Lt_new sub-slice grid and
    repair kinks the new term set forbids.

    Used when the term set changes mid-run (the reference applies new
    interactions to existing simulators, /root/reference/src/qmcrunner.rs:94-101
    — the operator string survives because SSE stores term applications, and a
    configuration is valid under any superset of terms). On the worldline side
    the grid length Lt = ltau * G can change with G, and the new delta
    constraints may forbid kinks at their regridded positions, so: nearest-
    position resample, then a forward pass forcing s[l+1] = s[l] wherever the
    kink across transfer l is not kinkable under the new compilation; any line
    left with a forbidden wrap kink is flattened to its tau=0 value. The result
    has strictly positive weight and the sweeps re-equilibrate from it."""
    R, nvars, Lt_old = s_old.shape
    idx = (np.arange(Lt_new) * Lt_old // Lt_new).astype(np.int32)
    s = np.asarray(jnp.take(s_old, jnp.asarray(idx), axis=2)).copy()
    allowed = comp_new.kinkable[:, np.arange(Lt_new) % comp_new.G]  # [nvars, Lt]
    for l in range(Lt_new - 1):
        forb = ~allowed[:, l]
        if forb.any():
            s[:, forb, l + 1] = s[:, forb, l]
    wrap_bad = (~allowed[:, Lt_new - 1])[None, :] & (s[:, :, -1] != s[:, :, 0])
    s = np.where(wrap_bad[:, :, None], s[:, :, 0:1], s)
    return s


# ------------------------------------------------------------------ weights


def _group_views(s, G: int):
    """[R, n, Lt] -> per-group (in, out) state views, each [R, n, ltau].

    The transfer at sub-slice ``l = G*t + g`` maps state ``s[.., l]`` to
    ``s[.., l+1]``: within a Trotter slice the out-state is the next group's
    plane at the same t; the last group wraps to group 0 of slice t+1."""
    R, n, Lt = s.shape
    lt = Lt // G
    s4 = s.reshape(R, n, lt, G)
    ins = [s4[:, :, :, g] for g in range(G)]
    outs = [
        s4[:, :, :, g + 1] if g + 1 < G else jnp.roll(s4[:, :, :, 0], -1, axis=2)
        for g in range(G)
    ]
    return ins, outs


def _class_block(cls: ArityClass, tab, sel: np.ndarray, s_in, s_out, floor):
    """Select-chain table evaluation for the ``sel`` terms of ``cls`` against
    coefficient table ``tab`` ([T, 2^k, 2^k]), on one group's state planes
    ``s_in``/``s_out`` [R, n, ltau]. Returns [R, len(sel), ltau].

    This is the engine's hot inner loop: a fused select chain over the
    class's ALLOWED (in, out) index pairs, with per-term coefficient rows —
    no 3-index gathers (the round-2 160x finding), and — round 3 — evaluated
    ONLY on the sub-slices where the terms' Trotter group is active (a G-fold
    arithmetic reduction over the full-Lt masked evaluation; ``floor`` seeds
    the accumulator: the clamp value for log-weights, 0 for estimators)."""
    R, _, lt = s_in.shape
    vs = cls.vars[sel]  # [Tg, k] np const
    tab_g = tab[jnp.asarray(sel)] if sel.size != tab.shape[0] else tab
    bin_ = jnp.take(s_in, vs.reshape(-1), axis=1).reshape(R, *vs.shape, lt) > 0
    bout = jnp.take(s_out, vs.reshape(-1), axis=1).reshape(R, *vs.shape, lt) > 0
    if cls.k == 1:
        b_in, b_out = bin_[:, :, 0, :], bout[:, :, 0, :]
        return jnp.where(
            b_in == b_out,
            jnp.where(b_in, tab_g[None, :, 1, 1, None], tab_g[None, :, 0, 0, None]),
            jnp.where(b_in, tab_g[None, :, 1, 0, None], tab_g[None, :, 0, 1, None]),
        )
    pw = (2 ** np.arange(cls.k, dtype=np.int32))[None, None, :, None]
    idx = (bin_.astype(jnp.int32) * pw).sum(2)  # [R, Tg, lt]
    idx_out = (bout.astype(jnp.int32) * pw).sum(2)
    if cls.diag_only:
        dim = 2**cls.k
        d = jnp.broadcast_to(tab_g[None, :, 0, 0, None], idx.shape)
        for v in range(1, dim):
            d = jnp.where(idx == v, tab_g[None, :, v, v, None], d)
        return jnp.where(idx == idx_out, d, floor)
    out = jnp.full_like(idx, floor, dtype=_F)
    for a, b in cls.pairs:
        hit = (idx == int(a)) & (idx_out == int(b))
        out = jnp.where(hit, tab_g[None, :, int(a), int(b), None], out)
    return out


def _infer_G(g_of_l) -> int:
    G = int(np.max(g_of_l)) + 1
    # every caller builds g_of_l = arange(Lt) % G; group blocking relies on it
    assert np.array_equal(np.asarray(g_of_l), np.arange(len(g_of_l)) % G)
    return G


def _term_logw(cls: ArityClass, s, g_of_l):
    """Per-term log-weight contributions [R, T, Lt] at every transfer (zero
    where the term's group is inactive). Internally group-blocked: the select
    chains run only on each term's own G-th of the sub-slices."""
    R, _, Lt = s.shape
    G = _infer_G(g_of_l)
    lt = Lt // G
    T = cls.vars.shape[0]
    ins, outs = _group_views(s, G)
    out = jnp.zeros((R, T, lt, G), _F)
    for g in range(G):
        sel = np.nonzero(cls.group == g)[0]
        if sel.size == 0:
            continue
        lw_g = _class_block(cls, cls.logT, sel, ins[g], outs[g], _NEG)
        # g as a length-1 slice: a scalar index next to the advanced `sel`
        # array would trigger NumPy's moved-to-front advanced-indexing rule
        out = out.at[:, sel, :, g : g + 1].set(lw_g[..., None])
    return out.reshape(R, T, Lt)


def _term_energy(cls: ArityClass, s, g_of_l):
    """Per-term energy-estimator contributions [R, T, Lt]; group-blocked like
    _term_logw. Transfers forbidden by the log-weight never occur in sampled
    states, so their floored value (0.0) is immaterial — and finite (no
    0 * inf NaN hazard)."""
    R, _, Lt = s.shape
    G = _infer_G(g_of_l)
    lt = Lt // G
    T = cls.vars.shape[0]
    ins, outs = _group_views(s, G)
    out = jnp.zeros((R, T, lt, G), _F)
    for g in range(G):
        sel = np.nonzero(cls.group == g)[0]
        if sel.size == 0:
            continue
        ev_g = _class_block(cls, cls.esti, sel, ins[g], outs[g], jnp.float32(0.0))
        out = out.at[:, sel, :, g : g + 1].set(ev_g[..., None])
    return out.reshape(R, T, Lt)


def _delta_logw(touched, s, g_of_l):
    """Per-variable delta-constraint log-weights [R, nvars, Lt]: _NEG where an
    untouched variable changes across a transfer."""
    free_mask = ~touched[:, g_of_l]  # np const [nvars, Lt]
    viol = (s != jnp.roll(s, -1, axis=2)) & free_mask[None]
    return jnp.where(viol, _NEG, 0.0)


def total_energy(comp: Compiled, s, ltau: int, offset: float):
    g_of_l = np.arange(s.shape[2]) % comp.G
    e = jnp.full(s.shape[0], offset, _F)
    for cls in comp.classes:
        e = e + _term_energy(cls, s, g_of_l).sum((1, 2)) / ltau
    return e


def term_op_counts(comp: Compiled, s, ltau: int, beta, offsets):
    """Per-term SSE op-count analogue [R, nterms]: beta * (C_t - <H_t>)."""
    g_of_l = np.arange(s.shape[2]) % comp.G
    R = s.shape[0]
    out = jnp.zeros((R, comp.nterms), _F)
    for cls in comp.classes:
        ev = _term_energy(cls, s, g_of_l).sum(2) / ltau  # [R, T]
        out = out.at[:, cls.term_ids].set(beta * (offsets[cls.term_ids][None] - ev))
    return out


def log_weight(comp: Compiled, s):
    g_of_l = np.arange(s.shape[2]) % comp.G
    lw = _delta_logw(comp.touched, s, g_of_l).sum((1, 2))
    for cls in comp.classes:
        lw = lw + _term_logw(cls, s, g_of_l).sum((1, 2))
    return lw


# ------------------------------------------------------------------- updates


def _subset_class(cls: ArityClass, sel: np.ndarray) -> ArityClass:
    """Restrict a class to the listed term indices (static subsetting:
    evaluating unaffected terms wastes bandwidth — TPU profile, round 2)."""
    if sel.size == cls.vars.shape[0]:
        return cls
    return cls._replace(
        vars=cls.vars[sel],
        logT=cls.logT[jnp.asarray(sel)],
        esti=cls.esti[jnp.asarray(sel)],
        group=cls.group[sel],
        cvar=tuple(cc[sel] for cc in cls.cvar),
        term_ids=cls.term_ids[sel],
    )


def _flip_delta_per_site(comp: Compiled, s, s_new, c: int):
    """Per-(color-c var, transfer) log-weight change [R, Cc, Lt] between s and
    s_new (s_new flips only color-c vars, at most one end per transfer)."""
    g_of_l = np.arange(s.shape[2]) % comp.G
    sites = comp.color_sites[c]
    R, _, Lt = s.shape
    G = comp.G
    lt = Lt // G
    Cc = sites.shape[0]
    d4 = jnp.zeros((R, Cc, lt, G), _F)
    # map var id -> position within color class (static)
    pos_of = np.full(int(comp.touched.shape[0]), -1, np.int32)
    pos_of[sites] = np.arange(Cc)
    ins, outs = _group_views(s, G)
    ins_n, outs_n = _group_views(s_new, G)
    for cls in comp.classes:
        cv = cls.cvar[c]  # [T] var id or -1 (np const)
        sel = np.nonzero(cv >= 0)[0]
        if sel.size == 0:
            continue
        # evaluate only the terms touching a color-c variable (the others
        # contribute zero; evaluating all T terms wasted up to half the
        # segment-pass cost — TPU profile, STATUS.md round-3 notes)
        if sel.size < cv.shape[0]:
            cls = _subset_class(cls, sel)
            cv = cv[sel]
        # group-blocked delta: the select chains run only on each term's own
        # G-th of the sub-slices (round-3 profile: these chains dominated the
        # sweep at ~G-fold redundancy under the old full-Lt masked form)
        for g in range(G):
            sel_g = np.nonzero(cls.group == g)[0]
            if sel_g.size == 0:
                continue
            dw = _class_block(cls, cls.logT, sel_g, ins_n[g], outs_n[g], _NEG) - \
                _class_block(cls, cls.logT, sel_g, ins[g], outs[g], _NEG)
            d4 = d4.at[:, pos_of[cv[sel_g]], :, g : g + 1].add(dw[..., None])
    d = d4.reshape(R, Cc, Lt)
    dd = _delta_logw(comp.touched, s_new, g_of_l) - _delta_logw(comp.touched, s, g_of_l)
    d = d + dd[:, sites, :]
    return d


def site_color_update(comp: Compiled, s, subkeys, c: int, parity: int):
    """Metropolis on (color-c var, sub-slice of given parity) positions."""
    sites = comp.color_sites[c]
    R, _, Lt = s.shape
    tpar = (np.arange(Lt) % 2) == parity
    flip = jnp.asarray(tpar)[None, None, :]  # color-c vars at parity sub-slices
    si = jnp.take(s, sites, axis=1)
    s_new = s.at[:, sites].set(jnp.where(flip, -si, si))
    d = _flip_delta_per_site(comp, s, s_new, c)  # [R, Cc, Lt] per transfer
    # flip at sub-slice l affects transfers l-1 and l
    dpos = jnp.roll(d, 1, axis=2) + d  # indexed by sub-slice l
    u = _uniform_per_replica(subkeys, (sites.shape[0], Lt))
    # Glauber acceptance: parallel Metropolis phases are reducible (downhill
    # moves fire with probability exactly 1, killing reverse paths); sigmoid
    # keeps both outcomes strictly positive and preserves detailed balance
    acc = (u < jax.nn.sigmoid(dpos)) & jnp.asarray(tpar)[None, None, :]
    return s.at[:, sites].set(jnp.where(acc, -si, si))


def line_color_update(comp: Compiled, s, subkeys, c: int):
    """Full-worldline flips of color-c variables (delta-free global move)."""
    sites = comp.color_sites[c]
    si = jnp.take(s, sites, axis=1)
    s_new = s.at[:, sites].set(-si)
    d = _flip_delta_per_site(comp, s, s_new, c).sum(-1)  # [R, Cc]
    u = _uniform_per_replica(subkeys, (sites.shape[0],))
    acc = (u < jax.nn.sigmoid(d))[:, :, None]  # Glauber (see site update)
    return s.at[:, sites].set(jnp.where(acc, -si, si))


def slice_color_update(comp: Compiled, s, subkeys, c: int, ltau: int):
    """Per-Trotter-slice flips (do_loop_updates family): flip a color-c var
    across all G sub-slices of one Trotter slice."""
    sites = comp.color_sites[c]
    R, _, Lt = s.shape
    G = comp.G
    keys, ksel = split_keys(subkeys)
    tau = jax.vmap(lambda k: jax.random.randint(k, (), 0, ltau))(ksel)  # [R]
    in_slice = jnp.asarray(np.arange(Lt)[None, :] // G) == tau[:, None]  # [R, Lt]
    si = jnp.take(s, sites, axis=1)
    s_new = s.at[:, sites].set(jnp.where(in_slice[:, None, :], -si, si))
    d = _flip_delta_per_site(comp, s, s_new, c).sum(-1)  # [R, Cc]
    u = _uniform_per_replica(keys, (sites.shape[0],))
    acc = (u < jax.nn.sigmoid(d))[:, :, None] & in_slice[:, None, :]  # Glauber
    return s.at[:, sites].set(jnp.where(acc, -si, si))


def segment_color_update(comp: Compiled, s, subkeys):
    """Segment flips: each (replica, color-c var) flips a contiguous
    sub-slice interval whose two boundaries are drawn uniformly from that
    variable's *kink-capable* positions (transfers whose group acts
    off-diagonally on it) — any other boundary is delta/diagonal-rejected, so
    uniform proposals would waste most attempts. Creates/destroys kink pairs
    at arbitrary separations (the SSE loop-update analogue)."""
    R, _, Lt = s.shape
    ltau = Lt // comp.G
    for c in range(len(comp.color_sites)):
        sites = comp.color_sites[c]
        Cc = sites.shape[0]
        offs = comp.kink_offs[c]  # [Cc, maxoffs] np const
        cnt = comp.kink_cnt[c]  # [Cc] np const
        ncap = np.maximum(cnt, 1) * ltau  # capable positions per var
        subkeys, k1 = split_keys(subkeys)
        u = _uniform_per_replica(k1, (Cc, 3))

        def draw(uu):
            j = (uu * ncap[None, :]).astype(jnp.int32)  # [R, Cc]
            within = j % np.maximum(cnt, 1)[None, :]
            slab = j // np.maximum(cnt, 1)[None, :]
            base = jnp.take_along_axis(
                jnp.asarray(np.broadcast_to(offs[None], (1, Cc, offs.shape[1]))),
                within[:, :, None], axis=2,
            )[:, :, 0]
            return base + comp.G * slab  # sub-slice position in [0, Lt)

        l1 = draw(u[..., 0])
        l2 = draw(u[..., 1])
        ln = (l2 - l1) % Lt  # 0 => empty proposal (no-op)
        pos = jnp.arange(Lt)[None, None, :]
        mask = (((pos - l1[..., None]) % Lt) < ln[..., None]) & (cnt > 0)[None, :, None]
        si = jnp.take(s, sites, axis=1)
        s_new = s.at[:, sites].set(jnp.where(mask, -si, si))
        d = _flip_delta_per_site(comp, s, s_new, c).sum(-1)  # [R, Cc]
        acc = (u[..., 2] < jax.nn.sigmoid(d))[:, :, None]  # Glauber
        s = s.at[:, sites].set(jnp.where(acc & mask, -si, si))
    return s, subkeys


def term_kink_update(comp: Compiled, s, subkeys, ltau: int):
    """Flip a multi-variable term's off-diagonal mask pattern through one of
    its own transfers (see _compile_term_kinks — the only move that can
    populate an XX/XXX/... term's antidiagonal). Geometry: a transfer at
    sub-slice l applies group l % G, so the **common boundary** t = g+1+G*a
    puts the joint toggle of all mask variables at a group-g transfer; each
    variable's flipped interval [a_v, t) then ends at its own independently
    drawn capable boundary a_v, so a variable can rebalance its kink parity
    at its own X transfer while its partner rebalances elsewhere (mixed
    pairings; flipping one shared interval only reaches parallel pairings —
    the 20-25%% kink-density bias this move replaced). Interior transfers see
    both ends of each flip (delta constraints stay satisfied; diagonal
    weights of straddled terms change and enter the acceptance); a proposal
    whose a_v lands where a lone toggle of v is forbidden is weight-rejected
    automatically."""
    R, nvars, Lt = s.shape
    G = comp.G
    g_of_l = np.arange(Lt) % G
    for tc in comp.tkink:
        P, kmax = tc.pvars.shape
        subkeys, k1 = split_keys(subkeys)
        u = _uniform_per_replica(k1, (P, kmax + 2))
        slab_t = jnp.minimum((u[..., 0] * ltau).astype(jnp.int32), ltau - 1)
        t = (jnp.asarray(tc.pgroup)[None] + 1 + G * slab_t) % Lt  # [R, P]
        pos = jnp.arange(Lt)[None, None, :]
        s_new = s
        masks = []
        for slot in range(kmax):
            # a_v: this variable's own capable boundary (offsets mod G x slab)
            cnt = np.maximum(tc.scnt[:, slot], 1)
            j = jnp.minimum(
                (u[..., slot + 1] * (cnt * ltau)[None]).astype(jnp.int32),
                (cnt * ltau)[None] - 1,
            )  # [R, P]
            within = j % cnt[None]
            slab = j // cnt[None]
            base = jnp.take_along_axis(
                jnp.asarray(tc.soffs[None, :, slot, :]), within[:, :, None], axis=2
            )[:, :, 0]
            a = (base + G * slab) % Lt
            ln = (t - a) % Lt  # 0 => this variable not flipped
            mask = ((pos - a[..., None]) % Lt) < ln[..., None]  # [R, P, Lt]
            masks.append(mask)
            sel = np.nonzero(tc.pact[:, slot])[0]
            if sel.size == 0:
                continue
            vv = tc.pvars[sel, slot]
            si = s[:, vv, :]
            s_new = s_new.at[:, vv, :].set(jnp.where(mask[:, sel, :], -si, si))
        delta = jnp.zeros((R, P), _F)
        for ci, cls in enumerate(comp.classes):
            selc, pidx = tc.att[ci]
            if selc.size == 0:
                continue
            cl = _subset_class(cls, selc)
            dw = (_term_logw(cl, s_new, g_of_l) - _term_logw(cl, s, g_of_l)).sum(-1)
            delta = delta.at[:, pidx].add(dw)
        acc = u[..., kmax + 1] < jax.nn.sigmoid(delta)  # Glauber (see site update)
        for slot in range(kmax):
            sel = np.nonzero(tc.pact[:, slot])[0]
            if sel.size == 0:
                continue
            vv = tc.pvars[sel, slot]
            si = s[:, vv, :]
            do = acc[:, sel, None] & masks[slot][:, sel, :]
            s = s.at[:, vv, :].set(jnp.where(do, -si, si))
    return s, subkeys


def free_var_update(comp: Compiled, s, subkeys):
    """Variables in no interaction are free spins: resample their (constant)
    worldlines uniformly."""
    fv = comp.free_vars
    if fv.shape[0] == 0:
        return s
    R = s.shape[0]
    rs = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (fv.shape[0],)))(subkeys)
    newv = (rs.astype(_S) * 2 - 1)[:, :, None]
    return s.at[:, fv].set(jnp.broadcast_to(newv, (R, fv.shape[0], s.shape[2])))


def sweep(comp: Compiled, s, keys, ltau: int, do_loop: bool):
    for c in range(len(comp.color_sites)):
        for parity in (0, 1):
            keys, sub = split_keys(keys)
            s = site_color_update(comp, s, sub, c, parity)
    for _ in range(N_SEGMENT_PASSES):
        keys, sub = split_keys(keys)
        s, _ = segment_color_update(comp, s, sub)
    if comp.tkink:
        for _ in range(N_TERMKINK_PASSES):
            keys, sub = split_keys(keys)
            s, _ = term_kink_update(comp, s, sub, ltau)
    for c in range(len(comp.color_sites)):
        keys, sub = split_keys(keys)
        s = line_color_update(comp, s, sub, c)
    if do_loop:
        for c in range(len(comp.color_sites)):
            keys, sub = split_keys(keys)
            s = slice_color_update(comp, s, sub, c, ltau)
    keys, sub = split_keys(keys)
    s = free_var_update(comp, s, sub)
    return s, keys


def run_sweeps(comp, s, keys, timesteps, ltau, do_loop, offset):
    def body(carry, _):
        s, keys, esum = carry
        s, keys = sweep(comp, s, keys, ltau, do_loop)
        return (s, keys, kadd(esum, total_energy(comp, s, ltau, offset))), None

    (s, keys, esum), _ = lax.scan(
        body, (s, keys, kzero(s.shape[0])), None, length=timesteps
    )
    return s, keys, esum


def run_sweeps_sample(comp, s, keys, timesteps, sampling_freq, ltau, do_loop, offset):
    nsamples = timesteps // sampling_freq

    def block(carry, _):
        s, keys, esum = carry
        for _ in range(sampling_freq):
            s, keys = sweep(comp, s, keys, ltau, do_loop)
            esum = kadd(esum, total_energy(comp, s, ltau, offset))
        return (s, keys, esum), s[:, :, 0]

    (s, keys, esum), samples = lax.scan(
        block, (s, keys, kzero(s.shape[0])), None, length=nsamples
    )
    rem = timesteps - nsamples * sampling_freq
    for _ in range(rem):
        s, keys = sweep(comp, s, keys, ltau, do_loop)
        esum = kadd(esum, total_energy(comp, s, ltau, offset))
    return s, keys, esum, jnp.swapaxes(samples, 0, 1)


def run_sweeps_bond_sample(comp, s, keys, timesteps, sampling_freq, ltau, do_loop, offset, offsets_t, beta):
    nsamples = timesteps // sampling_freq

    def block(carry, _):
        s, keys, esum = carry
        for _ in range(sampling_freq):
            s, keys = sweep(comp, s, keys, ltau, do_loop)
            esum = kadd(esum, total_energy(comp, s, ltau, offset))
        return (s, keys, esum), term_op_counts(comp, s, ltau, beta, offsets_t)

    (s, keys, esum), samples = lax.scan(
        block, (s, keys, kzero(s.shape[0])), None, length=nsamples
    )
    return s, keys, esum, jnp.swapaxes(samples, 0, 1)


# Uniform-signature shims: the gm drivers take a leading ``tables`` pytree of
# detached device arrays (generic_gm.detach_tables); the classic path has
# none, so these accept and ignore an empty tuple — GenericWorldline and
# parallel/replica.py then drive both paths identically.


def _run_sweeps_t(comp, tables, s, keys, timesteps, ltau, do_loop, offset):
    return run_sweeps(comp, s, keys, timesteps, ltau, do_loop, offset)


def _run_sweeps_sample_t(comp, tables, s, keys, timesteps, sampling_freq,
                         ltau, do_loop, offset):
    return run_sweeps_sample(
        comp, s, keys, timesteps, sampling_freq, ltau, do_loop, offset
    )


def _run_sweeps_bond_sample_t(comp, tables, s, keys, timesteps, sampling_freq,
                              ltau, do_loop, offset, offsets_t, beta):
    return run_sweeps_bond_sample(
        comp, s, keys, timesteps, sampling_freq, ltau, do_loop, offset,
        offsets_t, beta,
    )


class GenericWorldline:
    """Host-side handle on a batch of generic-Hamiltonian worldline samplers."""

    def __init__(
        self,
        termset: TermSet,
        beta: float,
        keys,
        states0,  # [R, nvars] int8 classical start
        do_loop_updates: bool,
        dtau_target=None,
    ):
        from .worldline import resolve_dtau

        dtau_target = resolve_dtau(dtau_target, default=DEFAULT_DTAU)
        self.ts = termset
        self.beta = float(beta)
        norm = max(
            [1.0] + [float(np.abs(t["mat"]).sum(axis=-1).max()) for t in termset.terms]
        )
        ltau = max(2, int(math.ceil(self.beta * min(norm, 20.0) / dtau_target)))
        self.ltau = ltau + (ltau % 2)
        self.dtau = self.beta / self.ltau
        self.comp = compile_terms(termset.nvars, termset.terms, self.dtau)
        if (self.ltau * self.comp.G) % 2:
            self.ltau += 1
            self.dtau = self.beta / self.ltau
        self.Lt = self.ltau * self.comp.G
        self.keys = keys
        self.do_loop = bool(do_loop_updates)
        self.offsets_t = np.array([t["offset"] for t in termset.terms], np.float32)
        self.s = jnp.broadcast_to(
            states0[:, :, None], (states0.shape[0], termset.nvars, self.Lt)
        )
        # comp holds static numpy index structures: close it over the jitted
        # drivers (one compile per term set, shared across calls).
        # The group-major matmul engine (engines/generic_gm.py) is the TPU
        # fast path: when its table footprint fits (gm_eligible), the SAME
        # update families run as a handful of MXU matmuls per sweep instead
        # of per-(class, group) select chains. State stays [R, n, Lt] at the
        # API boundary (regrid/checkpoint/itime all unchanged); conversion
        # to the bit plane happens once per driver call.
        from . import generic_gm as gg

        self.use_gm = gg.gm_eligible(self.comp, termset.nvars)
        # Every driver takes a leading ``tables`` pytree of device arrays —
        # the gm tables scale as G*n*TT (tens of MB per matrix at large n);
        # closed over the jit they would embed as HLO literals and blow
        # remote-compile transport limits (HTTP 413 on the axon tunnel at
        # n=416). Detached, they ride as ordinary device-resident jit args
        # (generic_gm.detach_tables). The classic path has no such tables:
        # its drivers take (and ignore) an empty tuple so replica.py's
        # shard_map wrappers see one uniform signature.
        if self.use_gm:
            gs = gg.compile_gm(self.comp, termset.nvars)
            kinks = gg.compile_gm_kinks(self.comp, gs) if self.comp.tkink else ()
            gs_skel, kinks_skel, self._tables = gg.detach_tables(gs, kinks)
            self._drv_sweeps = partial(gg.run_sweeps_gm, gs_skel, kinks_skel, self.comp)
            self._drv_sample = partial(
                gg.run_sweeps_sample_gm, gs_skel, kinks_skel, self.comp
            )
            self._drv_bond = partial(
                gg.run_sweeps_bond_sample_gm, gs_skel, kinks_skel, self.comp
            )
        else:
            self._tables = ()
            self._drv_sweeps = partial(_run_sweeps_t, self.comp)
            self._drv_sample = partial(_run_sweeps_sample_t, self.comp)
            self._drv_bond = partial(_run_sweeps_bond_sample_t, self.comp)
        # the raw driver partials stay accessible so parallel/replica.py can
        # re-wrap them in shard_map (replica-axis multi-chip)
        self._jit_sweeps = jax.jit(
            self._drv_sweeps, static_argnames=("timesteps", "ltau", "do_loop")
        )
        self._jit_sample = jax.jit(
            self._drv_sample,
            static_argnames=("timesteps", "sampling_freq", "ltau", "do_loop"),
        )
        self._jit_bond = jax.jit(
            self._drv_bond,
            static_argnames=("timesteps", "sampling_freq", "ltau", "do_loop"),
        )

    def timesteps(self, t: int):
        if t == 0:
            return np.asarray(
                total_energy(self.comp, self.s, self.ltau, self.ts.offset), np.float64
            )
        self.s, self.keys, esum = self._jit_sweeps(
            self._tables, self.s, self.keys, timesteps=int(t), ltau=self.ltau,
            do_loop=self.do_loop, offset=jnp.float32(self.ts.offset),
        )
        return kfinal(esum) / t

    def timesteps_sample(self, t: int, freq: int):
        self.s, self.keys, esum, samples = self._jit_sample(
            self._tables, self.s, self.keys, timesteps=int(t),
            sampling_freq=int(freq), ltau=self.ltau, do_loop=self.do_loop,
            offset=jnp.float32(self.ts.offset),
        )
        return kfinal(esum) / max(t, 1), np.asarray(samples == 1)

    def bond_sample(self, t: int, freq: int):
        es, samples = self.bond_sample_dev(t, freq)
        counts = np.maximum(np.rint(np.asarray(samples, np.float64)), 0).astype(np.int64)
        return es, counts

    # Device-series variants: same sweeps, but the [R, nsamp, C] sample series
    # stays ON DEVICE so autocorrelation channel products + FFT can run there
    # (observables.autocorrelation_device); only the [R, T] result crosses to
    # host (VERDICT round-4 weak 3: QmcRunner was the one class still shipping
    # its full series to numpy).

    def timesteps_sample_dev(self, t: int, freq: int):
        self.s, self.keys, esum, samples = self._jit_sample(
            self._tables, self.s, self.keys, timesteps=int(t),
            sampling_freq=int(freq), ltau=self.ltau, do_loop=self.do_loop,
            offset=jnp.float32(self.ts.offset),
        )
        return kfinal(esum) / max(t, 1), samples  # samples: [R, nsamp, n] +-1 int8

    def bond_sample_dev(self, t: int, freq: int):
        self.s, self.keys, esum, samples = self._jit_bond(
            self._tables, self.s, self.keys, timesteps=int(t),
            sampling_freq=int(freq), ltau=self.ltau, do_loop=self.do_loop,
            offset=jnp.float32(self.ts.offset),
            offsets_t=jnp.asarray(self.offsets_t), beta=jnp.float32(self.beta),
        )
        return kfinal(esum) / max(t, 1), samples  # [R, nsamp, nterms] f32

    def itime_states(self, g: int) -> np.ndarray:
        return np.asarray(self.s[g].T == 1)
