"""Pallas worldline sweep for parallel-tempering ladders: quenched couplings,
per-replica parameters.

The tempering benchmark (+-J spin glass, per-replica beta ladder,
tempering.rs:177-212 contract) defeats ops/wl_pallas.py's threshold tables:
couplings vary per edge (and possibly per replica — tempering.rs:70-113 edge
overrides), and (beta, Gamma, h) vary per replica, so site-flip dE is
continuous. This kernel generalizes the same machinery with **per-lane
parameter planes** (lane = replica * nvars + site):

- coupling planes hold each lane's OUTGOING bond couplings (ring: J(i->i+1);
  torus: J(i->y+1), J(i->x+1)); incoming couplings are the same planes rolled
  with the identical boundary-fix selects as the spins, so the quenched field
  F_i = sum_b J_b s_nbr is exact per (replica, site);
- dtau/ktau/h/p_bond planes are constant within each replica's lane block;
- Glauber acceptance uses two logs per point (logit(u) < -dE) instead of
  integer threshold tables — `jnp.log` lowers fine on Mosaic (unlike
  `jnp.exp` in a dynamic loop, which we measured at ~19 min compile);
- the FK cluster phases reuse the segmented ring scan (pointer doubling).

ONE sweep per call, designed to be invoked INSIDE the tempering jit loop
(tempering.run_tempering*): the swap phases, energy accumulation, and state
collection stay in XLA around it, so there are no host round-trips. Seeding:
per-replica int32 seeds derived from each replica's threefry key every sweep
(lane-keyed counter hash, ops/lanerng.py), so a replica's bits are a function
of its own key only — independent of chunking, and correct per shard when the
sweep runs inside shard_map (parallel/tempering.py).

Update composition matches tempering._mixed_sweep minus the rvb family
(ladders with rvb enabled fall back to XLA): 4 site phases ((color) x (tau
parity)) + 2 FK cluster phases (color).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanerng

__all__ = ["supported_ladder", "detect_topology", "build_planes", "ladder_sweep"]


def detect_topology(nvars: int, edge_a, edge_b):
    """('ring', nvars) or ('torus', size) by edge STRUCTURE only — coupling
    values are free (quenched disorder welcome), unlike
    engines/worldline.detect_dense which requires uniform J."""
    n = int(nvars)
    pairs = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(np.asarray(edge_a), np.asarray(edge_b))
    }
    if n >= 4 and n % 2 == 0:
        ring = {(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)}
        if pairs == ring:
            return ("ring", n)
    size = int(round(math.sqrt(n)))
    if size * size == n and size >= 2 and size % 2 == 0:
        torus = set()
        for i in range(n):
            x, y = i // size, i % size
            for nb in (x * size + (y + 1) % size, ((x + 1) % size) * size + y):
                torus.add((min(i, nb), max(i, nb)))
        if pairs == torus:
            return ("torus", size)
    return None

# ~22 f32 planes stay live through a cluster phase; the bench shape
# (L_tau=60 x 9216 lanes) needs ~50 MB of scoped VMEM (v5e has 128 MB)
_VMEM_LIMIT = 96 * 1024 * 1024
_MAX_POINTS = 1_000_000  # L * rc * nvars per chunk (grid program)


def supported_ladder(kind_size, nvars: int, ltau: int, R: int) -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    if plat in ("cpu", "gpu"):
        return False
    if kind_size is None or ltau < 4 or ltau % 2 or nvars % 2:
        return False
    kind, size = kind_size
    if kind == "torus" and size % 2:
        return False
    return ltau * nvars <= _MAX_POINTS  # a single replica must fit one chunk


def _chunk_replicas(R: int, nvars: int, ltau: int) -> int:
    """Replicas per grid program: the largest divisor of R whose chunk fits
    the per-program VMEM point budget."""
    rc = min(R, max(1, _MAX_POINTS // (ltau * nvars)))
    while R % rc:
        rc -= 1
    return rc


def build_planes(kind: str, size: int, nvars: int, edge_a, edge_b, edge_j,
                 betas, gammas, hs, ltau: int):
    """Host-side per-lane parameter planes, each [1, R*nvars] f32.

    ``edge_j`` is [E] (shared couplings) or [R, E] (per-replica overrides);
    returns (jplanes tuple, dt, kt, h, pb)."""
    R = len(betas)
    edge_j = np.asarray(edge_j, np.float64)
    shared = edge_j.ndim == 1
    ecount = 1 if kind == "ring" else 2
    jsite = np.zeros((ecount, R if not shared else 1, nvars))
    lookup = {}
    for k in range(len(edge_a)):
        a, b = int(edge_a[k]), int(edge_b[k])
        lookup[(a, b)] = k
        lookup[(b, a)] = k

    def owner_edges(i):
        if kind == "ring":
            return ((0, (i + 1) % nvars),)
        x, y = i // size, i % size
        return (
            (0, x * size + (y + 1) % size),  # y+1 bond
            (1, ((x + 1) % size) * size + y),  # x+1 bond
        )

    for i in range(nvars):
        for d, nb in owner_edges(i):
            k = lookup.get((i, nb))
            if k is not None:
                jsite[d, :, i] = edge_j[k] if shared else edge_j[:, k]
    if shared:
        jsite = np.broadcast_to(jsite, (ecount, R, nvars))
    jplanes = tuple(
        jnp.asarray(jsite[d].reshape(1, R * nvars), jnp.float32) for d in range(ecount)
    )

    betas = np.asarray(betas, np.float64)
    gammas = np.asarray(gammas, np.float64)
    hs = np.asarray(hs, np.float64)
    dtau = betas / ltau
    a = dtau * gammas
    ktau = -0.5 * np.log(np.tanh(a))
    pb = 1.0 - np.exp(-2.0 * ktau)

    def plane(v):
        return jnp.asarray(
            np.repeat(v, nvars).reshape(1, R * nvars), jnp.float32
        )

    return jplanes, plane(dtau), plane(ktau), plane(hs), plane(pb)


def _kernel(
    s_in, seed_in, j1, j2, dt, kt, hh, pb, s_out, sS,
    *, kind: str, size: int, nvars: int,
):
    L, RN = sS.shape
    sS[:] = s_in[0].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, RN), 1)
    i = lane % nvars
    tau = jax.lax.broadcasted_iota(jnp.int32, (L, RN), 0)
    ksteps = max(1, int(math.ceil(math.log2(L))))
    # lane-keyed counter RNG: seeds are fresh per sweep (derived from each
    # replica's evolving threefry key by the caller), so the draw counter is
    # just the within-sweep index 0..7
    seed_b = jnp.broadcast_to(seed_in[0, 0:1, :], (L, RN))
    pos1, pos2 = lanerng.make_pos_mix(tau, i, nvars)
    dtb = jnp.broadcast_to(dt[0], (L, RN))
    ktb = jnp.broadcast_to(kt[0], (L, RN))
    hb = jnp.broadcast_to(hh[0], (L, RN))
    pbb = jnp.broadcast_to(pb[0], (L, RN))

    def roll_up(x, k):
        return pltpu.roll(x, L - k, 0)

    def roll_dn(x, k):
        return pltpu.roll(x, k, 0)

    def lget(x, d):  # lane l+d
        return pltpu.roll(x, RN - d, 1)

    def lget_neg(x, d):  # lane l-d
        return pltpu.roll(x, d, 1)

    def pick(cond_plane, x, d_special, d_normal):
        """x at lane l+d_normal normally, l-d_special where cond (both > 0)."""
        return jnp.where(cond_plane, lget_neg(x, d_special), lget(x, d_normal))

    def pickm(cond_plane, x, d_special, d_normal):
        """x at lane l-d_normal normally, l+d_special where cond."""
        return jnp.where(cond_plane, lget(x, d_special), lget_neg(x, d_normal))

    if kind == "ring":
        cmask0 = i % 2 == 0
        c_hi = i == nvars - 1
        c_lo = i == 0
        j1b = jnp.broadcast_to(j1[0], (L, RN))

        def field(sf):
            fwd = j1b * pick(c_hi, sf, nvars - 1, 1)
            bwd = pickm(c_lo, j1b * sf, nvars - 1, 1)
            return fwd + bwd

    else:
        x = i // size
        y = i % size
        cmask0 = (x + y) % 2 == 0
        y_hi, y_lo = y == size - 1, y == 0
        x_hi, x_lo = x == size - 1, x == 0
        j1b = jnp.broadcast_to(j1[0], (L, RN))  # J(i -> y+1)
        j2b = jnp.broadcast_to(j2[0], (L, RN))  # J(i -> x+1)

        def field(sf):
            yp = j1b * pick(y_hi, sf, size - 1, 1)
            ym = pickm(y_lo, j1b * sf, size - 1, 1)
            xp = j2b * pick(x_hi, sf, nvars - size, size)
            xm = pickm(x_lo, j2b * sf, nvars - size, size)
            return yp + ym + xp + xm

    def rand_u(ctr):
        rb31 = lanerng.lane_draw31(seed_b, pos1, pos2, jnp.int32(ctr))
        u = rb31.astype(jnp.float32) * jnp.float32(1.0 / 2147483648.0) + jnp.float32(
            0.5 / 2147483648.0
        )
        # keep 1-u > 0 in f32 (u rounding to 1.0 would make log(1-u) = -inf
        # and silently force rejection)
        return jnp.minimum(u, jnp.float32(1.0 - 1.2e-7))

    def site_phase(ctr, color, parity):
        s = sS[:]
        sf = s.astype(jnp.float32)
        F = field(sf)
        ud = (roll_up(s, 1) + roll_dn(s, 1)).astype(jnp.float32)
        dE = -2.0 * sf * (dtb * (F + hb) - ktb * ud)
        u = rand_u(ctr)
        # Glauber via logit: u < sigmoid(-dE)  <=>  log(u) - log(1-u) < -dE
        acc = jnp.log(u) - jnp.log(1.0 - u) < -dE
        cm = cmask0 if color == 0 else ~cmask0
        acc = acc & cm & ((tau % 2) == parity)
        sS[:] = jnp.where(acc, -s, s)

    def cluster_phase(ctr, color):
        s = sS[:]
        sf = s.astype(jnp.float32)
        aligned = s == roll_up(s, 1)
        active = (aligned & (rand_u(ctr) < pbb)).astype(jnp.int32)
        de = -2.0 * sf * dtb * (field(sf) + hb)
        acc = de
        reach = active
        k = 1
        for _ in range(ksteps):
            acc = acc + jnp.where(reach == 1, roll_up(acc, k), 0.0)
            reach = reach & roll_up(reach, k)
            k *= 2
        allact = jnp.broadcast_to(jnp.min(active, axis=0, keepdims=True), (L, RN))
        heads = jnp.where(
            allact == 1, (tau == 0).astype(jnp.int32), 1 - roll_dn(active, 1)
        )
        de_tot = jnp.broadcast_to(jnp.sum(de, axis=0, keepdims=True), (L, RN))
        acc = jnp.where(allact == 1, de_tot, acc)
        log_u = jnp.log(rand_u(ctr + 1))
        flip = jnp.where((heads == 1) & (log_u < -acc), 1, 0)
        conn = roll_dn(active, 1)
        prop = flip
        cb = conn
        k = 1
        for _ in range(ksteps):
            prop = prop | (roll_dn(prop, k) & cb)
            cb = cb & roll_dn(cb, k)
            k *= 2
        cm = cmask0 if color == 0 else ~cmask0
        sS[:] = jnp.where((prop == 1) & cm, -s, s)

    d = 0
    for color in (0, 1):
        for parity in (0, 1):
            site_phase(d, color, parity)
            d += 1
    for color in (0, 1):
        cluster_phase(d, color)  # uses draws d and d+1
        d += 2
    s_out[0] = sS[:].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("kind", "size", "nvars"))
def _call(s, seedp, j1, j2, dt, kt, hh, pb, kind: str, size: int, nvars: int):
    C, L, RNc = s.shape
    sspec = pl.BlockSpec((1, L, RNc), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 8, RNc), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, RNc), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(C,),
        in_specs=[sspec, seed_spec] + [pspec] * 6,
        out_specs=sspec,
        scratch_shapes=[pltpu.VMEM((L, RNc), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, kind=kind, size=size, nvars=nvars),
        out_shape=jax.ShapeDtypeStruct((C, L, RNc), jnp.int8),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=600 * C * L * RNc,
            bytes_accessed=2 * C * L * RNc,
            transcendentals=12 * C * L * RNc,
        ),
    )(s, seedp, j1, j2, dt, kt, hh, pb)


def ladder_sweep(s, seeds, planes, kind: str, size: int, nvars: int):
    """One full worldline sweep on ``s[R, nvars, L]`` int8 with the quenched
    per-lane parameter ``planes`` (from build_planes). ``seeds`` is a traced
    int32 [R] — one per replica, fresh each sweep (derive from the loop's
    threefry keys via lanerng.replica_seeds_from_keys). Jittable — call
    inside the tempering loop. Ladders too large for one program chunk
    replicas over the grid; every replica's bits depend on its own seed only."""
    jplanes, dt, kt, hh, pb = planes
    j1 = jplanes[0]
    j2 = jplanes[1] if len(jplanes) > 1 else jplanes[0]
    R, nv, L = s.shape
    rc = _chunk_replicas(R, nv, L)
    C = R // rc
    RNc = rc * nv

    def chunked(x):  # [1, R*nv] -> [C, 1, RNc]
        return x.reshape(C, 1, RNc)

    s2 = jnp.transpose(s, (2, 0, 1)).reshape(L, R * nv)
    s2 = s2.reshape(L, C, RNc).transpose(1, 0, 2)  # [C, L, RNc]
    s2 = _call(
        s2, lanerng.seed_plane(seeds, rc, nv), chunked(j1), chunked(j2),
        chunked(dt), chunked(kt), chunked(hh), chunked(pb), kind, int(size), int(nvars),
    )
    s2 = s2.transpose(1, 0, 2).reshape(L, R * nv)
    return jnp.transpose(s2.reshape(L, R, nv), (1, 2, 0))
