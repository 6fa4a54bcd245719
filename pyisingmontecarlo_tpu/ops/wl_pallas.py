"""Fused Pallas TPU kernel: Trotterized TFIM worldline sweeps on uniform
periodic chains and square tori (the quantum benchmark shapes).

Reference contract: the SSE engine's `timesteps(t, beta)` hot loop
(/root/reference/src/lattice.rs:478-535 call sites; SURVEY.md §2.3
QmcIsingGraph). The XLA dense-roll path (engines/worldline.py) is the
correctness baseline; profiling shows it is dominated by threefry bit
generation (~6 uniform planes per sweep through the VPU) and per-phase HBM
round-trips of the worldline tensor. This kernel removes both:

- worldline planes stay **VMEM-resident across all sweeps**, laid out as
  ``[L_tau, Rc * nvars]`` — tau on sublanes, a CHUNK of replicas packed along
  lanes (lane = r * nvars + i) so the VPU runs full 8x128 tiles even for
  small systems (a one-replica-per-program grid leaves 7/8 of each tile idle
  for a 128-site chain). Spatial neighbor rolls use boundary-fix selects so
  lanes never couple across replicas;
- randomness is a **lane-keyed counter hash** (ops/lanerng.py): every
  element's bits are a pure function of (its replica's 32-bit seed, its
  replica-local (tau, site) position, the draw counter) — so a replica's
  trajectory depends only on its own seed, never on the batch size or the
  VMEM chunking (the reference's per-experiment reproducibility contract,
  lattice.rs:83-91, which the round-2 chunk-folded hardware-PRNG seeding
  broke);
- site-phase Glauber acceptance uses integer threshold tables (at most
  2x5x3 = 30 distinct dE values for uniform J, global h), no per-site
  transcendentals — same scheme as ops/sq2d_pallas.py;
- the FK time-ring cluster phases run a **segmented ring scan by pointer
  doubling** (log2(L_tau) sublane-roll steps): forward-run energy sums,
  per-cluster Metropolis at cluster heads, head-decision propagation — no
  gathers, scatters, or [L, L] membership matmuls;
- the energy estimator is linear in three per-element integer statistics
  (bond product, spin, time-aligned flag: total_energy = (J*Sb + h*Sh)/L
  - Gamma*[tanh(a)*A + coth(a)*(N - A)]/L), which the kernel accumulates in
  f32 planes — per-element per-sweep increments are +-2, so sums stay exact
  integers below 2^24 and the host f64 reduction loses nothing (the
  compensated-accumulation story of utils/accum.py, here exactly).

One full sweep = 4 masked site phases ((site color) x (tau parity)) + 2 FK
cluster phases (site color) — the exact update composition of the XLA dense
path (engines/worldline.sweep with a dense spec), so observables agree
statistically within MC error (validated on-chip, tests/test_pallas_tpu.py).
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

__all__ = ["supported", "supported_sample", "run_wl_sweeps_pallas", "run_wl_sample_pallas"]

_LANE_TARGET = 8192  # lanes per program (64 lane-tiles)
# Site acceptance via one exp instead of the 30-way threshold select chain:
# ~14% faster steady-state on the 1024-chain (4.39 vs 3.85 G site-updates/s)
# but Mosaic compile time explodes from ~30 s to ~19 min — not worth it.
_EXP_ACCEPT = False
_MAX_PLANE_BYTES = 2 * 1024 * 1024  # int32 worldline plane per program
_VMEM_LIMIT = 40 * 1024 * 1024  # scoped-vmem cap (phases hold ~8 live planes)
# LARGE-SPATIAL mode (VERDICT round-2 item 6: 256^2+ TFIM tori): one replica's
# plane up to 16 MB, rc = 1, and the estimator accumulators collapse from
# [3, L, RN] planes to [3, 8, RN] sublane-reduced rows so the VMEM budget is
# ~6 live planes instead of ~9 (the full-plane accumulators alone would be
# 3x the worldline). Per-row exactness bound: elements stay exact integers
# while 2*L*t <= 2^24, enforced by host-side dispatch chunking.
_MAX_PLANE_BYTES_LARGE = 16 * 1024 * 1024
# a 256^2 (beta=2) torus needs 101.6 MB scoped vmem (measured: compiler OOM
# at a 100 MB cap); v5e has 128 MB physical VMEM
_VMEM_LIMIT_LARGE = 112 * 1024 * 1024


def _plane_bytes(nvars: int, ltau: int) -> int:
    return nvars * ltau * 4


def _acc_rows(nvars: int, ltau: int) -> bool:
    """Row-accumulator (large-spatial) mode for planes past the packed gate."""
    return _plane_bytes(nvars, ltau) > _MAX_PLANE_BYTES


def supported(dense, nvars: int, ltau: int) -> bool:
    """TPU backend + a dense (uniform ring/torus) spec the kernel handles."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    if plat in ("cpu", "gpu"):
        return False
    if dense is None or ltau < 4 or ltau % 2 or nvars % 2:
        return False
    kind, size, _ = dense
    if kind == "torus" and size % 2:
        return False
    return _plane_bytes(nvars, ltau) <= _MAX_PLANE_BYTES_LARGE  # one replica/program


_MAX_SAMPLE_BYTES = 4 * 1024 * 1024  # VMEM slice-0 sample buffer per program


def supported_sample(dense, nvars: int, ltau: int, R: int, nsamples: int,
                     total: int = 0) -> bool:
    """Sampling variant: the per-program slice-0 sample buffer must also fit;
    in large-spatial (row-accumulator) mode the whole run must fit one
    dispatch's exact-integer budget (``total`` sweeps; 0 = unknown/small)."""
    if not supported(dense, nvars, ltau):
        return False
    if _acc_rows(nvars, ltau) and total > max(1, (1 << 23) // max(2 * ltau, 1)):
        return False
    rc = _chunk_replicas(R, nvars, ltau)
    if (rc * nvars) % 128:
        # the per-sample stage->HBM DMA slices the lane dim, which Mosaic
        # requires 128-aligned; tiny (replicas x nvars) planes fall back to
        # the XLA path (hit by e.g. a 4x4 torus with 4 experiments)
        return False
    return nsamples * rc * nvars <= _MAX_SAMPLE_BYTES


def _chunk_replicas(R: int, nvars: int, ltau: int) -> int:
    """Replicas packed per program: fill ~_LANE_TARGET lanes within the VMEM
    plane budget, and divide R exactly."""
    by_lanes = max(1, _LANE_TARGET // nvars)
    by_vmem = max(1, _MAX_PLANE_BYTES // (nvars * ltau * 4))
    rc = min(R, by_lanes, by_vmem)
    while R % rc:
        rc -= 1
    return rc


def _site_tables(j: float, h: float, dtau: float, ktau: float):
    """Glauber thresholds for the site phase, indexed
    [s>0][bsum/2 + 2][ud/2 + 1]; bsum is the +-1 neighbor sum (|bsum| <= 4),
    ud = s_up + s_down in {-2, 0, 2}."""
    thr = np.empty(30, np.int32)
    for si, s in enumerate((-1.0, 1.0)):
        for bi, bsum in enumerate((-4.0, -2.0, 0.0, 2.0, 4.0)):
            for ui, ud in enumerate((-2.0, 0.0, 2.0)):
                dE = -2.0 * s * (dtau * (j * bsum + h) - ktau * ud)
                pacc = 1.0 / (1.0 + math.exp(min(dE, 60.0)))
                thr[si * 15 + bi * 3 + ui] = np.int32(pacc * 2147483647.0)
    cde = np.empty(13, np.float32)  # cluster-phase per-site diagonal dE
    for si, s in enumerate((-1.0, 1.0)):
        for bi, bsum in enumerate((-4.0, -2.0, 0.0, 2.0, 4.0)):
            cde[si * 5 + bi] = -2.0 * s * dtau * (j * bsum + h)
    # linear dE coefficients for the exp-acceptance path:
    # dE = s * (c10 * bsum + c11 * ud + c12)
    cde[10] = -2.0 * dtau * j
    cde[11] = 2.0 * ktau
    cde[12] = -2.0 * dtau * h
    return thr, cde


def _select_thr(thr_ref, s, bsum, ud):
    def chain(base):
        t = jnp.full(s.shape, thr_ref[base + 2 * 3 + 1], jnp.int32)
        for bi, bv in enumerate((-4, -2, 0, 2, 4)):
            for ui, uv in enumerate((-2, 0, 2)):
                if bv == 0 and uv == 0:
                    continue
                t = jnp.where((bsum == bv) & (ud == uv), thr_ref[base + bi * 3 + ui], t)
        return t

    return jnp.where(s > 0, chain(15), chain(0))


def _select_cde(cde_ref, s, bsum):
    def chain(base):
        t = jnp.full(s.shape, cde_ref[base + 2], jnp.float32)
        for bi, bv in enumerate((-4, -2, 0, 2, 4)):
            if bv == 0:
                continue
            t = jnp.where(bsum == bv, cde_ref[base + bi], t)
        return t

    return jnp.where(s > 0, chain(5), chain(0))


_DRAWS_PER_SWEEP = 8  # 4 site phases + 2 cluster phases x (bond, uniform)


def _build_ops(seed_ref, thr_ref, cde_ref, pb_ref, accs_out, sS, kind: str, size: int,
               nvars: int, acc_rows: bool = False):
    """Shared sweep machinery over the VMEM plane sS [L, RN]: returns
    full_sweep(t) which runs the 4 site phases + 2 FK cluster phases +
    per-sweep estimator accumulation for global sweep index ``t``.
    ``acc_rows``: accumulate sublane-reduced [8, RN] rows (all 8 rows carry
    the same sum) instead of full [L, RN] planes (large-spatial mode)."""
    L, RN = sS.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, RN), 1)
    i = lane % nvars  # site index within its replica
    tau = jax.lax.broadcasted_iota(jnp.int32, (L, RN), 0)
    ksteps = max(1, int(math.ceil(math.log2(L))))
    # lane-keyed counter RNG (per-replica reproducibility; module docstring)
    seed_b = jnp.broadcast_to(seed_ref[0:1, :], (L, RN))
    pos1, pos2 = lanerng.make_pos_mix(tau, i, nvars)

    def _rand31(ctr):
        return lanerng.lane_draw31(seed_b, pos1, pos2, ctr)

    def roll_up(x, k):  # x[t+k] at position t (forward along the tau ring)
        return pltpu.roll(x, L - k, 0)

    def roll_dn(x, k):  # x[t-k]
        return pltpu.roll(x, k, 0)

    def lget(x, d_pos):  # value at lane l+d (d > 0)
        return pltpu.roll(x, RN - d_pos, 1)

    def lget_neg(x, d_neg):  # value at lane l-d (d > 0)
        return pltpu.roll(x, d_neg, 1)

    if kind == "ring":
        cmask0 = i % 2 == 0

        def neighbor_sum(s):
            right = jnp.where(i == nvars - 1, lget_neg(s, nvars - 1), lget(s, 1))
            left = jnp.where(i == 0, lget(s, nvars - 1), lget_neg(s, 1))
            return right + left

        def bond_partners(s):  # neighbors owning each lane's outgoing bonds
            return (jnp.where(i == nvars - 1, lget_neg(s, nvars - 1), lget(s, 1)),)

    else:  # torus, i = x * size + y
        x = i // size
        y = i % size
        cmask0 = (x + y) % 2 == 0

        def neighbor_sum(s):
            yp = jnp.where(y == size - 1, lget_neg(s, size - 1), lget(s, 1))
            ym = jnp.where(y == 0, lget(s, size - 1), lget_neg(s, 1))
            xp = jnp.where(x == size - 1, lget_neg(s, nvars - size), lget(s, size))
            xm = jnp.where(x == 0, lget(s, nvars - size), lget_neg(s, size))
            return yp + ym + xp + xm

        def bond_partners(s):
            yp = jnp.where(y == size - 1, lget_neg(s, size - 1), lget(s, 1))
            xp = jnp.where(x == size - 1, lget_neg(s, nvars - size), lget(s, size))
            return (yp, xp)

    def site_phase(ctr, color: int, parity: int):
        s = sS[:]
        bsum = neighbor_sum(s)
        ud = roll_up(s, 1) + roll_dn(s, 1)
        rb = _rand31(ctr)
        if _EXP_ACCEPT:
            # Glauber via one exp: u < 1/(1+e^dE)  <=>  u*(1+e^dE) < 1
            sf = s.astype(jnp.float32)
            dE = sf * (cde_ref[10] * bsum.astype(jnp.float32)
                       + cde_ref[11] * ud.astype(jnp.float32) + cde_ref[12])
            u = rb.astype(jnp.float32) * jnp.float32(1.0 / 2147483648.0)
            acc = u * (1.0 + jnp.exp(dE)) < 1.0
        else:
            acc = rb <= _select_thr(thr_ref, s, bsum, ud)
        cm = cmask0 if color == 0 else ~cmask0
        acc = acc & cm & ((tau % 2) == parity)
        sS[:] = jnp.where(acc, -s, s)

    def cluster_phase(ctr, color: int):
        s = sS[:]
        aligned = s == roll_up(s, 1)  # time bond t -> t+1
        # masks live as 0/1 int32: Mosaic cannot rotate i1 vectors
        active = (aligned & (_rand31(ctr) < pb_ref[0])).astype(jnp.int32)
        de = _select_cde(cde_ref, s, neighbor_sum(s))
        # forward segmented run-sum + connectivity by pointer doubling
        acc = de
        reach = active
        k = 1
        for _ in range(ksteps):
            acc = acc + jnp.where(reach == 1, roll_up(acc, k), 0.0)
            reach = reach & roll_up(reach, k)
            k *= 2
        # broadcasts stay int32/f32 (sub-32-bit vector broadcasts fail to
        # lower); [1, RN] stats broadcast up to [L, RN] before any comparison
        allact = jnp.broadcast_to(jnp.min(active, axis=0, keepdims=True), (L, RN))
        heads = jnp.where(
            allact == 1, (tau == 0).astype(jnp.int32), 1 - roll_dn(active, 1)
        )
        de_tot = jnp.broadcast_to(jnp.sum(de, axis=0, keepdims=True), (L, RN))
        acc = jnp.where(allact == 1, de_tot, acc)
        u31 = _rand31(ctr + 1).astype(jnp.float32)
        log_u = jnp.log((u31 + 0.5) * (1.0 / 2147483648.0))
        flip = jnp.where((heads == 1) & (log_u < -acc), 1, 0)
        # propagate the head decision forward across active bonds
        conn = roll_dn(active, 1)  # conn[t]: t joined to t-1
        prop = flip
        cb = conn
        k = 1
        for _ in range(ksteps):
            prop = prop | (roll_dn(prop, k) & cb)
            cb = cb & roll_dn(cb, k)
            k *= 2
        cm = cmask0 if color == 0 else ~cmask0
        sS[:] = jnp.where((prop == 1) & cm, -s, s)

    def accumulate():
        s = sS[:]
        sb = jnp.zeros((L, RN), jnp.int32)
        for nb in bond_partners(s):
            sb = sb + s * nb
        al = (s == roll_up(s, 1)).astype(jnp.int32)
        if acc_rows:
            for k, x in enumerate((sb, s, al)):
                row = jnp.sum(x.astype(jnp.float32), axis=0, keepdims=True)
                accs_out[0, k] += jnp.broadcast_to(row, (8, RN))
        else:
            accs_out[0, 0] += sb.astype(jnp.float32)
            accs_out[0, 1] += s.astype(jnp.float32)
            accs_out[0, 2] += al.astype(jnp.float32)

    def full_sweep(t):
        base = t * _DRAWS_PER_SWEEP
        d = 0
        for color in (0, 1):
            for parity in (0, 1):
                site_phase(base + d, color, parity)
                d += 1
        for color in (0, 1):
            cluster_phase(base + d, color)  # uses draws d and d+1
            d += 2
        accumulate()

    return full_sweep


def _kernel(
    nsweeps_ref, thr_ref, cde_ref, pb_ref,
    s_in, seed_in, s_out, accs_out, sS,
    *, kind: str, size: int, nvars: int, acc_rows: bool = False,
):
    L, RN = sS.shape
    sS[:] = s_in[0].astype(jnp.int32)
    accs_out[0] = jnp.zeros(accs_out.shape[1:], jnp.float32)
    full_sweep = _build_ops(
        seed_in[0], thr_ref, cde_ref, pb_ref, accs_out, sS, kind, size, nvars,
        acc_rows=acc_rows,
    )
    jax.lax.fori_loop(0, nsweeps_ref[0], lambda t, carry: (full_sweep(t), carry)[1], 0)
    s_out[0] = sS[:].astype(jnp.int8)


def _kernel_sample(
    thr_ref, cde_ref, pb_ref,
    s_in, seed_in, s_out, accs_out, samples_out, sS, stage, sem,
    *, kind: str, size: int, nvars: int, freq: int, nsamples: int, rem: int,
    acc_rows: bool = False,
):
    """Sampling variant: ``nsamples`` blocks of ``freq`` sweeps; after each
    block the slice-0 spin row is staged into the VMEM sample buffer
    (samples_out [1, nsamples, RN] int8), then ``rem`` trailing sweeps.
    Mirrors engines/worldline.run_sweeps_sample (estimator accumulated every
    sweep, samples after each freq-th)."""
    c = pl.program_id(0)
    L, RN = sS.shape
    sS[:] = s_in[0].astype(jnp.int32)
    accs_out[0] = jnp.zeros(accs_out.shape[1:], jnp.float32)
    full_sweep = _build_ops(
        seed_in[0], thr_ref, cde_ref, pb_ref, accs_out, sS, kind, size, nvars,
        acc_rows=acc_rows,
    )

    def block(t, carry):
        t0 = t * freq
        jax.lax.fori_loop(t0, t0 + freq, lambda tt, cc: (full_sweep(tt), cc)[1], 0)
        # slice-0 states of the chunk, broadcast over the 8-row stage (the
        # HBM sample buffer carries a dummy 8-row dim: int8 tiling requires
        # sublane extents that a 1-row slice cannot satisfy)
        stage[:] = jnp.broadcast_to(sS[0:1, :], (8, sS.shape[1])).astype(jnp.int8)
        # samples_out is [C, nsamples, 8, RN] in HBM: c and t index UNTILED
        # dims, so the DMA needs no sublane/lane alignment proofs (a direct
        # vector store at dynamic t into the sublane-tiled dim cannot be
        # proven 8-aligned by Mosaic)
        dma = pltpu.make_async_copy(stage, samples_out.at[c, t], sem)
        dma.start()
        dma.wait()
        return carry

    jax.lax.fori_loop(0, nsamples, block, 0)
    jax.lax.fori_loop(
        nsamples * freq, nsamples * freq + rem, lambda tt, cc: (full_sweep(tt), cc)[1], 0
    )
    s_out[0] = sS[:].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("kind", "size", "nvars", "acc_rows"))
def _call(s, seedp, nsweeps, thr, cde, pb, kind: str, size: int, nvars: int,
          acc_rows: bool = False):
    C, L, RN = s.shape
    AL = 8 if acc_rows else L
    spec = pl.BlockSpec((1, L, RN), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 8, RN), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(
        (1, 3, AL, RN), lambda c, *_: (c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # nsweeps, thresholds, cluster dE, pbond
        grid=(C,),
        in_specs=[spec, seed_spec],
        out_specs=(spec, acc_spec),
        scratch_shapes=[pltpu.VMEM((L, RN), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, kind=kind, size=size, nvars=nvars, acc_rows=acc_rows),
        out_shape=(
            jax.ShapeDtypeStruct((C, L, RN), jnp.int8),
            jax.ShapeDtypeStruct((C, 3, AL, RN), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_LARGE if acc_rows else _VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=500 * C * L * RN,  # per-sweep estimate; nsweeps is dynamic
            bytes_accessed=17 * C * L * RN,
            transcendentals=2 * C * L * RN,
        ),
    )(nsweeps, thr, cde, pb, s, seedp)


@functools.partial(
    jax.jit, static_argnames=("kind", "size", "nvars", "freq", "nsamples", "rem", "acc_rows")
)
def _call_sample(s, seedp, thr, cde, pb, kind: str, size: int, nvars: int,
                 freq: int, nsamples: int, rem: int, acc_rows: bool = False):
    C, L, RN = s.shape
    AL = 8 if acc_rows else L
    spec = pl.BlockSpec((1, L, RN), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 8, RN), lambda c, *_: (c, 0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(
        (1, 3, AL, RN), lambda c, *_: (c, 0, 0, 0), memory_space=pltpu.VMEM
    )
    samp_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # thresholds, cluster dE, pbond
        grid=(C,),
        in_specs=[spec, seed_spec],
        out_specs=(spec, acc_spec, samp_spec),
        scratch_shapes=[
            pltpu.VMEM((L, RN), jnp.int32),
            pltpu.VMEM((8, RN), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nsweeps = freq * nsamples + rem
    return pl.pallas_call(
        functools.partial(
            _kernel_sample, kind=kind, size=size, nvars=nvars,
            freq=freq, nsamples=nsamples, rem=rem, acc_rows=acc_rows,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, L, RN), jnp.int8),
            jax.ShapeDtypeStruct((C, 3, AL, RN), jnp.float32),
            jax.ShapeDtypeStruct((C, nsamples, 8, RN), jnp.int8),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_LARGE if acc_rows else _VMEM_LIMIT
        ),
        cost_estimate=pl.CostEstimate(
            flops=500 * C * L * RN * nsweeps,
            bytes_accessed=17 * C * L * RN,
            transcendentals=2 * C * L * RN * nsweeps,
        ),
    )(thr, cde, pb, s, seedp)


def run_wl_sample_pallas(s_tau_last, seeds_u32, freq: int, nsamples: int, rem: int,
                         dense, beta: float, gamma: float, h: float, ltau: int):
    """nsamples blocks of ``freq`` sweeps (slice-0 states recorded after each
    block) + ``rem`` trailing sweeps. Returns (s, esum[R] f64,
    samples[R, nsamples, nvars] int8), matching
    engines/worldline.run_sweeps_sample."""
    kind, size, j = dense
    R, nvars, L = s_tau_last.shape
    rc = _chunk_replicas(R, nvars, ltau)
    C = R // rc
    dtau = float(beta) / ltau
    a = dtau * float(gamma)
    ktau = -0.5 * math.log(math.tanh(a))
    thr, cde = _site_tables(float(j), float(h), dtau, ktau)
    pb = np.asarray([np.int32((1.0 - math.exp(-2.0 * ktau)) * 2147483647.0)])
    s = jnp.transpose(s_tau_last.reshape(C, rc, nvars, L), (0, 3, 1, 2)).reshape(
        C, L, rc * nvars
    )
    rows = _acc_rows(nvars, ltau)
    s, accs, samples = _call_sample(
        s, lanerng.seed_plane(seeds_u32, rc, nvars), jnp.asarray(thr), jnp.asarray(cde),
        jnp.asarray(pb), kind, int(size), int(nvars), int(freq), int(nsamples), int(rem),
        acc_rows=rows,
    )
    s_back = jnp.transpose(
        s.reshape(C, L, rc, nvars), (0, 2, 3, 1)
    ).reshape(R, nvars, L)
    samples = samples[:, :, 0, :].reshape(C, nsamples, rc, nvars)
    samples = samples.transpose(0, 2, 1, 3).reshape(R, nsamples, nvars)
    if rows:
        st = np.asarray(accs, np.float64)[:, :, 0, :].reshape(C, 3, rc, nvars)
        sums = st.sum(axis=3).transpose(0, 2, 1).reshape(R, 3)
    else:
        st = np.asarray(accs, np.float64).reshape(C, 3, L, rc, nvars)
        sums = st.sum(axis=(2, 4)).transpose(0, 2, 1).reshape(R, 3)
    sb, sh, al = sums[:, 0], sums[:, 1], sums[:, 2]
    t = float(freq * nsamples + rem)
    ntb = nvars * L * t
    tanh_a, coth_a = math.tanh(a), 1.0 / math.tanh(a)
    ediag = (float(j) * sb + float(h) * sh) / ltau
    eoff = -float(gamma) * (tanh_a * al + coth_a * (ntb - al)) / ltau
    return s_back, ediag + eoff, samples


def run_wl_sweeps_pallas(s_tau_last, seeds_u32, nsweeps, dense,
                         beta: float, gamma: float, h: float, ltau: int):
    """Run ``nsweeps`` (traced int) full worldline sweeps on
    ``s_tau_last[R, nvars, L]`` int8. Returns (s, esum[R] f64) where esum is
    the per-sweep total-energy estimator accumulated over the run, matching
    engines/worldline.run_sweeps."""
    kind, size, j = dense
    R, nvars, L = s_tau_last.shape
    rc = _chunk_replicas(R, nvars, ltau)
    C = R // rc
    dtau = float(beta) / ltau
    a = dtau * float(gamma)
    ktau = -0.5 * math.log(math.tanh(a))
    thr, cde = _site_tables(float(j), float(h), dtau, ktau)
    pb = np.asarray([np.int32((1.0 - math.exp(-2.0 * ktau)) * 2147483647.0)])
    # [R, nvars, L] -> [C, L, rc*nvars] (lane = r_within_chunk * nvars + i)
    s = jnp.transpose(s_tau_last.reshape(C, rc, nvars, L), (0, 3, 1, 2)).reshape(
        C, L, rc * nvars
    )
    rows = _acc_rows(nvars, ltau)
    seed_arr = np.asarray(seeds_u32, np.uint32)
    thr_j, cde_j, pb_j = jnp.asarray(thr), jnp.asarray(cde), jnp.asarray(pb)
    total = int(nsweeps)
    # exactness bound per dispatch: row accumulators advance by <= 2L per
    # sweep (plane accumulators by <= 2); chunk so sums stay exact integers
    # below 2^24. Chunk boundaries depend only on (t, L), and each chunk
    # folds its index into the lane-RNG seeds (the in-kernel draw counter
    # restarts per call), so trajectories remain a pure function of the
    # per-replica seed.
    bound = max(1, (1 << 23) // max(2 * L, 1)) if rows else (1 << 23)
    sums = np.zeros((R, 3), np.float64)
    done = 0
    while done < total:
        step = min(total - done, bound)
        chunk_seeds = (
            seed_arr
            if done == 0
            else seed_arr ^ np.uint32((0x9E3779B9 * (done // bound)) & 0xFFFFFFFF)
        )
        s, accs = _call(
            s, lanerng.seed_plane(chunk_seeds, rc, nvars),
            jnp.asarray(step, jnp.int32).reshape(1),
            thr_j, cde_j, pb_j, kind, int(size), int(nvars), acc_rows=rows,
        )
        if rows:
            st = np.asarray(accs, np.float64)[:, :, 0, :].reshape(C, 3, rc, nvars)
            sums += st.sum(axis=3).transpose(0, 2, 1).reshape(R, 3)
        else:
            st = np.asarray(accs, np.float64).reshape(C, 3, L, rc, nvars)
            sums += st.sum(axis=(2, 4)).transpose(0, 2, 1).reshape(R, 3)
        done += step
    s_back = jnp.transpose(
        s.reshape(C, L, rc, nvars), (0, 2, 3, 1)
    ).reshape(R, nvars, L)
    sb, sh, al = sums[:, 0], sums[:, 1], sums[:, 2]
    t = float(total)
    ntb = nvars * L * t  # time bonds summed over all sweeps
    tanh_a, coth_a = math.tanh(a), 1.0 / math.tanh(a)
    ediag = (float(j) * sb + float(h) * sh) / ltau
    eoff = -float(gamma) * (tanh_a * al + coth_a * (ntb - al)) / ltau
    # raw stats power the SSE op-count diagnostics: per-sweep means of the
    # diagonal energy and the kink count
    stats = dict(diag_mean=ediag / max(t, 1.0), kinks_mean=(ntb - al) / max(t, 1.0))
    return s_back, ediag + eoff, stats
