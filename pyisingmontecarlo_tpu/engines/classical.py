"""Classical Ising Monte Carlo engine: colored parallel sweeps, vmapped replicas.

TPU-native replacement for the reference's ``qmc::classical::graph::GraphState``
(contract reconstructed in SURVEY.md section 2.3 from call sites such as
/root/reference/src/lattice.rs:198-212 and classicising.rs:97-110). The
reference runs one strictly-sequential Metropolis simulator per CPU thread; here

- the **replica axis is a batch axis** (``s[R, nvars]`` int8 spins, thousands of
  replicas per chip),
- one "time step" (reference ``do_time_step``, lattice.rs:205) becomes a
  composition of **conflict-free colored sweeps**: all sites of one color class
  update simultaneously from their local fields, then the next color, etc.,
- the reference's three move families map to: single-spin colored sweeps
  (``nspinupdates``), edge-colored endpoint-pair flips (``nedgeupdates``), and
  random-walk worm chains of sequential single-site Metropolis flips
  (``nwormupdates``),
- randomness is counter-based threefry, one key per replica, so experiment ``i``
  depends only on its seed.

Energy convention (README.md:46, lattice.rs:43-44): H = sum_e J_e s_a s_b +
sum_i h_i s_i with s = +-1 and positive J antiferromagnetic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph import CompiledGraph
from ..rng import split_keys

__all__ = [
    "GraphArrays",
    "device_graph",
    "energy",
    "random_states",
    "time_step",
    "run_steps",
    "sw_cluster_update",
    "run_sampling",
]

_F = jnp.float32
_S = jnp.int8


class GraphArrays(NamedTuple):
    """Device-resident compiled graph (pytree of jnp arrays; static shapes)."""

    neighbors: jax.Array  # [nvars, D] int32
    jmat: jax.Array  # [nvars, D] f32
    degree: jax.Array  # [nvars] int32
    edge_a: jax.Array  # [E] int32
    edge_b: jax.Array  # [E] int32
    edge_j: jax.Array  # [E] f32
    # per site-color precomputed tables
    c_sites: Tuple[jax.Array, ...]  # [Cc]
    c_nbrs: Tuple[jax.Array, ...]  # [Cc, D]
    c_j: Tuple[jax.Array, ...]  # [Cc, D]
    # per edge-color tables
    e_a: Tuple[jax.Array, ...]  # [Ec]
    e_b: Tuple[jax.Array, ...]
    e_j: Tuple[jax.Array, ...]
    e_a_nbrs: Tuple[jax.Array, ...]  # [Ec, D]
    e_a_j: Tuple[jax.Array, ...]
    e_b_nbrs: Tuple[jax.Array, ...]
    e_b_j: Tuple[jax.Array, ...]


def device_graph(cg: CompiledGraph) -> GraphArrays:
    nb = jnp.asarray(cg.neighbors, jnp.int32)
    jm = jnp.asarray(cg.jmat, _F)
    return GraphArrays(
        neighbors=nb,
        jmat=jm,
        degree=jnp.asarray(cg.degree, jnp.int32),
        edge_a=jnp.asarray(cg.edge_a, jnp.int32),
        edge_b=jnp.asarray(cg.edge_b, jnp.int32),
        edge_j=jnp.asarray(cg.edge_j, _F),
        c_sites=tuple(jnp.asarray(s, jnp.int32) for s in cg.color_sites),
        c_nbrs=tuple(jnp.asarray(cg.neighbors[s], jnp.int32) for s in cg.color_sites),
        c_j=tuple(jnp.asarray(cg.jmat[s], _F) for s in cg.color_sites),
        # pair-flip tables use the STRONG (distance-2) edge coloring: within a
        # class no two pairs share a vertex or a bond, so simultaneous flips
        # with locally computed delta-E are a product of independent
        # reversible kernels. A merely proper edge coloring biases the
        # distribution (tests/test_edge_move_exact.py).
        e_a=tuple(jnp.asarray(cg.edge_a[e], jnp.int32) for e in cg.strong_ecolor_edges),
        e_b=tuple(jnp.asarray(cg.edge_b[e], jnp.int32) for e in cg.strong_ecolor_edges),
        e_j=tuple(jnp.asarray(cg.edge_j[e], _F) for e in cg.strong_ecolor_edges),
        e_a_nbrs=tuple(
            jnp.asarray(cg.neighbors[cg.edge_a[e]], jnp.int32) for e in cg.strong_ecolor_edges
        ),
        e_a_j=tuple(jnp.asarray(cg.jmat[cg.edge_a[e]], _F) for e in cg.strong_ecolor_edges),
        e_b_nbrs=tuple(
            jnp.asarray(cg.neighbors[cg.edge_b[e]], jnp.int32) for e in cg.strong_ecolor_edges
        ),
        e_b_j=tuple(jnp.asarray(cg.jmat[cg.edge_b[e]], _F) for e in cg.strong_ecolor_edges),
    )


def importance_weights(cg: CompiledGraph):
    """Per-edge-color attempt probabilities for importance-sampled edge moves
    (``enable_edge_importance_sampling``, lattice.rs:200): w_e = |J_e| / max|J|
    clamped to [0.05, 1] so zero-coupling edges are still occasionally tried.
    Returns a tuple of [Ec] f32 arrays aligned with GraphArrays.e_a."""
    mj = np.abs(np.asarray(cg.edge_j, np.float64))
    top = float(mj.max()) if mj.size else 1.0
    w = np.clip(mj / top, 0.05, 1.0) if top > 0 else np.ones_like(mj)
    return tuple(jnp.asarray(w[e], _F) for e in cg.strong_ecolor_edges)


def energy(ga: GraphArrays, bias: jax.Array, s: jax.Array) -> jax.Array:
    """E[r] = sum_e J_e s_a s_b + sum_i h_i s_i (reference convention)."""
    sf = s.astype(_F)
    eb = (ga.edge_j[None, :] * sf[:, ga.edge_a] * sf[:, ga.edge_b]).sum(-1)
    return eb + sf @ bias.astype(_F)


def random_states(keys: jax.Array, nvars: int) -> jax.Array:
    """Per-replica random +-1 initial states from per-replica keys."""
    def one(k):
        return (jax.random.bernoulli(k, 0.5, (nvars,)).astype(_S) * 2 - 1)

    return jax.vmap(one)(keys)


def _accept(u: jax.Array, dE: jax.Array, beta, heatbath) -> jax.Array:
    """Acceptance rule. ``heatbath`` is either a static bool or a per-replica
    bool array [R] (mixed ensembles, e.g. LatticeTempering's per-graph
    ``enable_heatbath_update``)."""
    if isinstance(heatbath, bool):
        if heatbath:
            return u < jax.nn.sigmoid(-beta * dE)
        # log-space Metropolis: log u < -beta*dE (auto-accepts dE<=0, log u < 0)
        return jnp.log(u) < -beta * dE
    hb = heatbath.reshape(heatbath.shape + (1,) * (dE.ndim - 1))
    return jnp.where(
        hb, u < jax.nn.sigmoid(-beta * dE), jnp.log(u) < -beta * dE
    )


def _uniform_per_replica(keys: jax.Array, shape_tail) -> jax.Array:
    return jax.vmap(lambda k: jax.random.uniform(k, shape_tail))(keys)


def _spin_color_update(ga, bias, s, subkeys, beta, c: int, heatbath: bool):
    sites, nbrs, jrow = ga.c_sites[c], ga.c_nbrs[c], ga.c_j[c]
    sj = jnp.take(s, nbrs.reshape(-1), axis=1).reshape(s.shape[0], *nbrs.shape).astype(_F)
    B = (jrow[None] * sj).sum(-1)  # [R, Cc]
    si = jnp.take(s, sites, axis=1)
    dE = -2.0 * si.astype(_F) * (B + bias[sites][None])
    u = _uniform_per_replica(subkeys, (sites.shape[0],))
    # Glauber acceptance for ALL parallel colored updates: simultaneous
    # Metropolis factors satisfy detailed balance but lose irreducibility
    # (downhill flips fire with probability exactly 1, making e.g. the mixed
    # states of a 2-spin ferromagnet unreachable at full-sweep boundaries).
    # The sequential worm move keeps Metropolis acceptance.
    acc = _accept(u, dE, beta, True)
    return s.at[:, sites].set(jnp.where(acc, -si, si))


def _edge_color_update(ga, bias, s, subkeys, beta, c: int, heatbath: bool, iw=None):
    """Pair flip over each edge of edge-color class c. ``iw`` (None, [Ec], or
    [R, Ec] f32 in (0, 1]) enables importance-sampled attempts: each edge is
    attempted with probability iw_e (state-independent, hence a symmetric
    proposal — Glauber acceptance stays exact). This is the TPU analogue of
    the reference's ``enable_edge_importance_sampling`` (lattice.rs:200,
    SURVEY.md §2.3: 'importance sampling weights edge-flip attempts by energy
    cost'): attempt frequency follows coupling magnitude |J_e|, so strong
    (energetically dominant) bonds are worked proportionally harder on
    heterogeneous graphs. On uniform-J graphs the weights are all 1 and the
    move reduces to the plain sweep."""
    a, b, j = ga.e_a[c], ga.e_b[c], ga.e_j[c]
    R = s.shape[0]
    sa = jnp.take(s, a, axis=1).astype(_F)
    sb = jnp.take(s, b, axis=1).astype(_F)
    na, ja = ga.e_a_nbrs[c], ga.e_a_j[c]
    nb_, jb = ga.e_b_nbrs[c], ga.e_b_j[c]
    Ba = (ja[None] * jnp.take(s, na.reshape(-1), axis=1).reshape(R, *na.shape).astype(_F)).sum(-1)
    Bb = (jb[None] * jnp.take(s, nb_.reshape(-1), axis=1).reshape(R, *nb_.shape).astype(_F)).sum(-1)
    # flip both endpoints: bond ab term unchanged, so add back its double-counted delta
    dE = (
        -2.0 * sa * (Ba + bias[a][None])
        - 2.0 * sb * (Bb + bias[b][None])
        + 4.0 * j[None] * sa * sb
    )
    if iw is None:
        u = _uniform_per_replica(subkeys, (a.shape[0],))
    else:
        u2 = _uniform_per_replica(subkeys, (a.shape[0], 2))
        u = u2[..., 0]
    acc = _accept(u, dE, beta, True)  # Glauber (see _spin_color_update)
    if iw is not None:
        acc = acc & (u2[..., 1] < (iw if iw.ndim == 2 else iw[None]))
    sia = jnp.take(s, a, axis=1)
    sib = jnp.take(s, b, axis=1)
    s = s.at[:, a].set(jnp.where(acc, -sia, sia))
    s = s.at[:, b].set(jnp.where(acc, -sib, sib))
    return s


def _worm_update(ga, bias, s, subkeys, beta, wlen: int, heatbath: bool):
    """One worm per replica: a length-``wlen`` random walk of sequential
    single-site Metropolis flips (each step is an exact-detailed-balance move;
    the walk correlates successive update locations like the reference's worm
    family without data-dependent control flow)."""
    R, nvars = s.shape
    r_idx = jnp.arange(R)
    # split FIRST so the uniform block and the start-site draw use distinct
    # child keys (no key reuse between the two streams)
    ku, k0 = split_keys(subkeys)
    # all randomness generated up front (2 uniforms per step per replica):
    # u_acc for Metropolis acceptance, u_mov for start-site / neighbor choice
    u_all = _uniform_per_replica(ku, (wlen, 2))  # [R, wlen, 2]
    u_acc = jnp.moveaxis(u_all[..., 0], 1, 0)  # [wlen, R]
    u_mov = jnp.moveaxis(u_all[..., 1], 1, 0)
    v0 = jax.vmap(lambda k: jax.random.randint(k, (), 0, nvars))(k0)

    def body(carry, us):
        s, v = carry
        u1, u2 = us
        nbrs = ga.neighbors[v]  # [R, D]
        jrow = ga.jmat[v]  # [R, D]
        B = (jrow * s[r_idx[:, None], nbrs].astype(_F)).sum(-1)
        sv = s[r_idx, v]
        dE = -2.0 * sv.astype(_F) * (B + bias[v])
        acc = _accept(u1, dE, beta, heatbath)
        s = s.at[r_idx, v].set(jnp.where(acc, -sv, sv))
        deg = jnp.maximum(ga.degree[v], 1)
        pick = jnp.minimum((u2 * deg.astype(_F)).astype(jnp.int32), deg - 1)
        v = nbrs[r_idx, pick]
        return (s, v), None

    (s, _), _ = lax.scan(body, (s, v0), (u_acc, u_mov))
    return s


def sw_cluster_update(ga: GraphArrays, bias: jax.Array, s: jax.Array, subkeys, beta):
    """One Swendsen-Wang cluster update per replica (Fortuin-Kasteleyn).

    TPU-native large-move family standing in for the reference worm's
    loop-building role (/root/reference/src/classicising.rs:100-106 call site;
    VERDICT.md round-1 item 5). Works on arbitrary signed couplings: a bond
    ``e=(a,b)`` is *satisfied* when its energy contribution ``J_e s_a s_b`` is
    negative and freezes with probability ``1 - exp(-2 beta |J_e|)``; clusters
    are connected components of frozen bonds, found by iterative scatter-min
    label propagation with pointer doubling (O(log diameter) rounds, all
    dense array ops). Longitudinal fields use the standard ghost-spin
    construction: site ``i`` freezes to the fixed +1 ghost with probability
    ``1 - exp(-2 beta |h_i|)`` when ``h_i s_i < 0``; ghost-frozen clusters do
    not flip, all others flip with probability 1/2. Exact detailed balance
    w.r.t. ``exp(-beta E)``; no acceptance step.
    """
    R, nvars = s.shape
    ea, eb = ga.edge_a, ga.edge_b
    k1, k_e = split_keys(subkeys)
    k2, k_g = split_keys(k1)
    _, k_f = split_keys(k2)

    sf = s.astype(_F)
    sa = jnp.take(sf, ea, axis=1)
    sb = jnp.take(sf, eb, axis=1)
    p_e = 1.0 - jnp.exp(-2.0 * beta * jnp.abs(ga.edge_j))[None]  # [1, E]
    u_e = _uniform_per_replica(k_e, (ea.shape[0],))
    frozen = ((ga.edge_j[None] * sa * sb) < 0) & (u_e < p_e)  # [R, E]

    u_g = _uniform_per_replica(k_g, (nvars,))
    p_g = 1.0 - jnp.exp(-2.0 * beta * jnp.abs(bias))[None]
    ghost = ((bias[None] * sf) < 0) & (u_g < p_g)  # [R, nvars]

    lab0 = jnp.broadcast_to(jnp.arange(nvars, dtype=jnp.int32)[None], (R, nvars))
    big = jnp.int32(nvars)

    def body(state):
        lab, _ = state
        la = jnp.take(lab, ea, axis=1)
        lb = jnp.take(lab, eb, axis=1)
        new = (
            lab.at[:, ea].min(jnp.where(frozen, lb, big))
            .at[:, eb].min(jnp.where(frozen, la, big))
        )
        new = jnp.take_along_axis(new, new, axis=1)  # pointer doubling
        return new, jnp.any(new != lab)

    lab, _ = lax.while_loop(lambda st: st[1], body, (lab0, jnp.bool_(True)))

    r_idx = jnp.arange(R)[:, None]
    ghost_root = (
        jnp.zeros((R, nvars), jnp.int32).at[r_idx, lab].max(ghost.astype(jnp.int32))
    )
    u_f = _uniform_per_replica(k_f, (nvars,))
    flip_root = (u_f < 0.5) & (ghost_root == 0)
    flip = jnp.take_along_axis(flip_root, lab, axis=1)
    return jnp.where(flip, -s, s)


def time_step(
    ga: GraphArrays,
    bias: jax.Array,
    s: jax.Array,
    keys: jax.Array,
    beta,
    nspin_sweeps: int,
    nedge_sweeps: int,
    nworms: int,
    only_basic: bool,
    heatbath: bool,
    wlen: int,
    nclusters: int = 0,
    iw=None,
):
    """One reference 'time step' (GraphState::do_time_step analogue).
    ``iw`` (None or per-color attempt-probability arrays) importance-samples
    the edge moves (see _edge_color_update)."""
    for _ in range(nspin_sweeps):
        for c in range(len(ga.c_sites)):
            keys, sub = split_keys(keys)
            s = _spin_color_update(ga, bias, s, sub, beta, c, heatbath)
    if not only_basic:
        for _ in range(nedge_sweeps):
            for c in range(len(ga.e_a)):
                keys, sub = split_keys(keys)
                s = _edge_color_update(
                    ga, bias, s, sub, beta, c, heatbath,
                    iw=None if iw is None else iw[c],
                )
        for _ in range(nworms):
            keys, sub = split_keys(keys)
            s = _worm_update(ga, bias, s, sub, beta, wlen, heatbath)
        for _ in range(nclusters):
            keys, sub = split_keys(keys)
            s = sw_cluster_update(ga, bias, s, sub, beta)
    return s, keys


@partial(
    jax.jit,
    static_argnames=(
        "nspin_sweeps", "nedge_sweeps", "nworms", "only_basic", "heatbath", "wlen", "nclusters",
    ),
)
def run_steps(
    ga, bias, s, keys, beta_arr, nspin_sweeps, nedge_sweeps, nworms, only_basic, heatbath, wlen,
    nclusters=0, iw=None,
):
    """Run len(beta_arr) time steps; beta may vary per step (annealing)."""

    def body(carry, beta):
        s, keys = carry
        s, keys = time_step(
            ga, bias, s, keys, beta, nspin_sweeps, nedge_sweeps, nworms, only_basic, heatbath,
            wlen, nclusters, iw,
        )
        return (s, keys), None

    (s, keys), _ = lax.scan(body, (s, keys), beta_arr)
    return s, keys


@partial(
    jax.jit,
    static_argnames=(
        "nspin_sweeps", "nedge_sweeps", "nworms", "only_basic", "heatbath", "wlen", "nclusters",
    ),
)
def run_steps_energies(
    ga, bias, s, keys, beta_arr, nspin_sweeps, nedge_sweeps, nworms, only_basic, heatbath, wlen,
    nclusters=0, iw=None,
):
    """Like run_steps but records the energy after every time step."""

    def body(carry, beta):
        s, keys = carry
        s, keys = time_step(
            ga, bias, s, keys, beta, nspin_sweeps, nedge_sweeps, nworms, only_basic, heatbath,
            wlen, nclusters, iw,
        )
        return (s, keys), energy(ga, bias, s)

    (s, keys), es = lax.scan(body, (s, keys), beta_arr)
    return s, keys, es.T  # [R, T]


def _dispatch_chunk() -> int:
    import os

    try:
        return max(0, int(os.environ.get("PMC_STEPS_PER_DISPATCH", "0")))
    except ValueError:
        return 0


_AUTO_DISPATCH_SECONDS = 20.0  # target wall time per XLA execution
_AUTO_PROBE_STEPS = 16
_AUTO_MIN_STEPS = 256  # below this, never bother probing


def _auto_chunk(run_one, T: int) -> int:
    """Pick steps-per-dispatch by timing a probe chunk (run twice: the first
    call pays the compile, the second measures steady-state). Keeps every
    dispatch near _AUTO_DISPATCH_SECONDS so TPU-frontend watchdogs that kill
    minutes-long executions (observed on the axon tunnel) can never fire,
    without the user setting PMC_STEPS_PER_DISPATCH (VERDICT round-2 weak 7).
    The chunk is rounded down to a power of two so repeat runs hit the
    persistent compile cache (remote compiles cost 30 s+ on the axon tunnel)."""
    import time

    run_one(_AUTO_PROBE_STEPS)  # compile
    t0 = time.perf_counter()
    run_one(_AUTO_PROBE_STEPS)
    dt = max(time.perf_counter() - t0, 1e-6)
    est = max(int(_AUTO_PROBE_STEPS * _AUTO_DISPATCH_SECONDS / dt), _AUTO_PROBE_STEPS)
    return 1 << min(est.bit_length() - 1, 22)


def run_steps_chunked(ga, bias, s, keys, beta_arr, *, collect_energies=False, **kw):
    """run_steps / run_steps_energies with host-side dispatch splitting.

    Some TPU frontends kill a single XLA execution that runs for minutes
    (observed on the axon tunnel: very long cluster-update scans on large
    arbitrary graphs crash the worker). Splitting the step scan into bounded
    chunks is **bit-exact**: the per-step key splits ride the (s, keys) carry,
    so the chunked run consumes the identical RNG stream and produces the
    identical trajectory as one dispatch (tests/test_classicising.py).

    ``PMC_STEPS_PER_DISPATCH=N`` forces a chunk size; unset, long runs time a
    probe chunk and bound each dispatch automatically (_auto_chunk)."""
    chunk = _dispatch_chunk()
    T = int(beta_arr.shape[0])

    def run_piece(s, keys, ba):
        if collect_energies:
            return run_steps_energies(ga, bias, s, keys, ba, **kw)
        out = run_steps(ga, bias, s, keys, ba, **kw)
        return out[0], out[1], None

    if not chunk:
        if T <= _AUTO_MIN_STEPS:
            s, keys, es = run_piece(s, keys, beta_arr)
            return (s, keys, es) if collect_energies else (s, keys)

        def probe(n):
            # timing probe on a throwaway copy: forces completion via a
            # device->host transfer (block_until_ready does not block on the
            # axon tunnel), and leaves (s, keys) untouched for bit-exactness
            out = run_piece(s, keys, beta_arr[:n])
            np.asarray(out[0])

        chunk = _auto_chunk(probe, T)
        if T <= chunk:
            s, keys, es = run_piece(s, keys, beta_arr)
            return (s, keys, es) if collect_energies else (s, keys)
    elif T <= chunk:
        s, keys, es = run_piece(s, keys, beta_arr)
        return (s, keys, es) if collect_energies else (s, keys)
    es_parts = []
    for i in range(0, T, chunk):
        s, keys, es = run_piece(s, keys, beta_arr[i : i + chunk])
        if collect_energies:
            es_parts.append(es)
    if collect_energies:
        return s, keys, jnp.concatenate(es_parts, axis=1)
    return s, keys


@partial(
    jax.jit,
    static_argnames=(
        "timesteps",
        "sampling_freq",
        "nspin_sweeps",
        "nedge_sweeps",
        "nworms",
        "only_basic",
        "heatbath",
        "wlen",
        "nclusters",
    ),
)
def run_sampling(
    ga,
    bias,
    s,
    keys,
    beta,
    timesteps,
    sampling_freq,
    nspin_sweeps,
    nedge_sweeps,
    nworms,
    only_basic,
    heatbath,
    wlen,
    nclusters=0,
    iw=None,
):
    """timesteps steps at fixed beta, recording (energy, state) after every
    sampling_freq-th step. Returns (s, keys, energies[R, t//freq],
    states[R, t//freq, nvars])."""
    nsamples = timesteps // sampling_freq

    def block(carry, _):
        s, keys = carry
        beta_arr = jnp.full((sampling_freq,), beta, _F)
        s, keys = run_steps(
            ga, bias, s, keys, beta_arr, nspin_sweeps, nedge_sweeps, nworms, only_basic, heatbath,
            wlen, nclusters, iw,
        )
        return (s, keys), (energy(ga, bias, s), s)

    (s, keys), (es, ss) = lax.scan(block, (s, keys), None, length=nsamples)
    rem = timesteps - nsamples * sampling_freq
    if rem:
        beta_arr = jnp.full((rem,), beta, _F)
        s, keys = run_steps(
            ga, bias, s, keys, beta_arr, nspin_sweeps, nedge_sweeps, nworms, only_basic, heatbath,
            wlen, nclusters, iw,
        )
    return s, keys, es.T, jnp.swapaxes(ss, 0, 1)
