"""Fused Pallas TPU kernel: checkerboard Metropolis on a uniform square torus.

The speed-of-light formulation of the benchmark path (BASELINE.json north
star: >= 50 attempted flips/ns/chip at 1024^2):

- **packed checkerboard layout**: the plane is stored as two half-width int32
  arrays E[x, k] (sites with x+y even, y = 2k + x%2) and O[x, k] (x+y odd).
  A phase updates one color array *unconditionally* — no parity masking, and
  both the arithmetic and the PRNG draw touch exactly the sites being
  updated (2x over the naive masked formulation);
- neighbor fields in packed space: vertical neighbors keep the same packed
  column (two row rolls); horizontal neighbors are the other array plus its
  lane-roll, direction alternating with row parity (one roll + select);
- both color planes live in **VMEM for the entire call** — HBM is touched
  once on entry and once on exit, however many sweeps run;
- randomness is the TPU **hardware PRNG** (``pltpu.prng_random_bits``);
- acceptance needs no per-site exp/sigmoid: with uniform J and global bias
  h, the local field B takes 5 even values, so the Glauber probability
  ``1/(1+e^{beta dE})`` is one of 10 numbers per sweep, computed as scalars
  from the per-sweep beta (annealing schedules supported) and applied via a
  short select chain against 31-bit random integers;
- phases run in row strips (vertical halo = one row above/below, fetched as
  aligned 8-row blocks) to bound VMEM temporaries.

Grid = one program per replica; each program seeds the PRNG from its
replica's seed, preserving the per-experiment reproducibility contract
(lattice.rs:83-91 discipline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "run_steps_2d_pallas",
    "run_sampling_2d_pallas",
    "supported",
    "pack_checkerboard",
    "unpack_checkerboard",
]

_STRIP = 256  # rows per strip


def supported(L: int = 0) -> bool:
    """Pallas TPU path: real TPU backend and a packable lattice size.

    L >= 32 with L % 8 == 0: strips fetch 8-row halo blocks, and Mosaic
    handles packed widths below the 128-lane tile by masking (round-1 gate
    required W % 128 == 0, silently dropping 64^2-128^2 production sizes to
    XLA — VERDICT.md weak item 7)."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    if plat in ("cpu", "gpu"):
        return False
    return L == 0 or (L % 8 == 0 and L >= 32)


def pack_checkerboard(s):
    """s[R, L, L] -> (E[R, L, L/2], O[R, L, L/2]): E holds x+y even sites at
    column k = (y - x%2)/2, O holds x+y odd sites."""
    R, L, _ = s.shape
    pairs = s.reshape(R, L, L // 2, 2)
    row_even = (jnp.arange(L) % 2 == 0)[None, :, None]
    E = jnp.where(row_even, pairs[..., 0], pairs[..., 1])
    O = jnp.where(row_even, pairs[..., 1], pairs[..., 0])
    return E, O


def unpack_checkerboard(E, O):
    """Inverse of pack_checkerboard over the trailing [L, W] dims (any
    leading batch dims: [R, L, W] states or [R, T, L, W] sample stacks)."""
    L, W = E.shape[-2], E.shape[-1]
    row_even = (jnp.arange(L) % 2 == 0)[:, None]
    p0 = jnp.where(row_even, E, O)
    p1 = jnp.where(row_even, O, E)
    return jnp.stack([p0, p1], axis=-1).reshape(*E.shape[:-1], 2 * W)


def _dE_values(j: float, h: float) -> np.ndarray:
    """dE for flipping spin s with neighbor sum B: dE = -2 s (J B + h).
    Order: s=-1 with B in (-4,-2,0,2,4), then s=+1 with B in (-4,-2,0,2,4)."""
    out = np.empty(10, np.float32)
    for si, s in enumerate((-1.0, 1.0)):
        for bi, B in enumerate((-4.0, -2.0, 0.0, 2.0, 4.0)):
            out[si * 5 + bi] = -2.0 * s * (j * B + h)
    return out


def _sweep_fns(dE_ref, eS, oS):
    """Shared sweep machinery over the VMEM color planes eS/oS [L, W] int32.

    Returns (thresholds, full_sweep): thresholds(beta) -> 10 scalar tables,
    full_sweep(ts) runs one checkerboard sweep (both phases, in row strips)."""
    L, W = eS.shape
    S = _STRIP if L % _STRIP == 0 else L
    nstrips = L // S
    rowp = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0) % 2  # S even: same per strip

    def thresholds(beta):
        # 10 scalar Glauber thresholds: floor(1/(1+e^{beta dE}) * (2^31-1));
        # 31-bit compare (Mosaic lacks f32->u32 casts), resolution 2^-31.
        # Glauber, not Metropolis: parallel checkerboard Metropolis loses
        # irreducibility (see engines/classical.py).
        return [
            (jax.nn.sigmoid(-beta * dE_ref[k]) * 2147483647.0).astype(jnp.int32)
            for k in range(10)
        ]

    def select_thr(ts, s, B):
        def chain(base):
            t = jnp.full((S, W), ts[base + 4], jnp.int32)
            for k, bv in enumerate((-4, -2, 0, 2)):
                t = jnp.where(B == bv, ts[base + k], t)
            return t

        return jnp.where(s > 0, chain(5), chain(0))

    def strip_update(i, upd, oth, even_phase, ts):
        """Update rows [i*S, i*S+S) of color array ``upd`` from ``oth``."""
        base = pl.multiple_of(i * S, S)
        rows = upd[pl.ds(base, S), :]  # [S, W] sites being updated
        orows = oth[pl.ds(base, S), :]  # same rows of the other color
        # vertical neighbors: same packed column, rows x-1 and x+1 of oth
        up_base = pl.multiple_of((i * S - 8) % L, 8)
        dn_base = pl.multiple_of((i * S + S) % L, 8)
        up = oth[pl.ds(up_base, 8), :][7:8, :]
        dn = oth[pl.ds(dn_base, 8), :][0:1, :]
        ext = jnp.concatenate([up, orows, dn], axis=0)  # [S+2, W]
        # horizontal: oth same column plus lane-roll; direction alternates
        # with row parity (and swaps between the two phases)
        rollp = pltpu.roll(orows, 1, 1)  # brings k-1 into k
        rollm = pltpu.roll(orows, W - 1, 1)  # brings k+1 into k
        if even_phase:
            horiz = jnp.where(rowp == 0, rollp, rollm)
        else:
            horiz = jnp.where(rowp == 0, rollm, rollp)
        B = ext[:-2, :] + ext[2:, :] + orows + horiz
        rb = pltpu.bitcast(pltpu.prng_random_bits((S, W)), jnp.int32)
        rb31 = jax.lax.shift_right_logical(rb, 1)
        acc = rb31 <= select_thr(ts, rows, B)
        upd[pl.ds(base, S), :] = jnp.where(acc, -rows, rows)

    def full_sweep(ts):
        jax.lax.fori_loop(0, nstrips, lambda i, c: (strip_update(i, eS, oS, True, ts), c)[1], 0)
        jax.lax.fori_loop(0, nstrips, lambda i, c: (strip_update(i, oS, eS, False, ts), c)[1], 0)

    return thresholds, full_sweep


def _kernel(
    seeds_ref, dE_ref, beta_ref, e_in, o_in, e_out, o_out, eS, oS, *, nsweeps: int, blen: int
):
    r = pl.program_id(0)
    pltpu.prng_seed(seeds_ref[r])
    eS[:] = e_in[0].astype(jnp.int32)
    oS[:] = o_in[0].astype(jnp.int32)
    thresholds, full_sweep = _sweep_fns(dE_ref, eS, oS)

    def sweep(t, _):
        # blen == 1 (constant beta) statically collapses the index to 0,
        # keeping the SMEM schedule buffer tiny for long fixed-beta runs
        beta = beta_ref[t % blen] if blen > 1 else beta_ref[0]
        full_sweep(thresholds(beta))
        return 0

    jax.lax.fori_loop(0, nsweeps, sweep, 0)
    e_out[0] = eS[:].astype(jnp.int8)
    o_out[0] = oS[:].astype(jnp.int8)


def _kernel_sample(
    seeds_ref, dE_ref, beta_ref, e_in, o_in,
    e_out, o_out, se_out, so_out,
    eS, oS, stE, stO, sem,
    *, freq: int, nsamples: int, rem: int,
):
    """Fused sampling: nsamples blocks of ``freq`` sweeps; after each block the
    packed planes are staged to int8 and DMA'd into the HBM sample buffers
    (se_out/so_out [R, nsamples, L, W]). Replaces the round-1 host loop that
    paid one kernel dispatch per sample block (VERDICT.md weak item 5)."""
    r = pl.program_id(0)
    pltpu.prng_seed(seeds_ref[r])
    eS[:] = e_in[0].astype(jnp.int32)
    oS[:] = o_in[0].astype(jnp.int32)
    W = eS.shape[1]
    Wp = stE.shape[1]  # W padded to the 128-lane tile (HBM DMA alignment)
    thresholds, full_sweep = _sweep_fns(dE_ref, eS, oS)
    ts = thresholds(beta_ref[0])  # sampling runs at constant beta

    def sample_block(t, _):
        jax.lax.fori_loop(0, freq, lambda _, c: (full_sweep(ts), c)[1], 0)
        if Wp == W:
            stE[:] = eS[:].astype(jnp.int8)
            stO[:] = oS[:].astype(jnp.int8)
        else:
            stE[:, :W] = eS[:].astype(jnp.int8)
            stO[:, :W] = oS[:].astype(jnp.int8)
        # the stage->HBM copy (~L*W bytes) is tiny next to freq sweeps of
        # compute; waiting inline keeps the stage buffers single-buffered
        ce = pltpu.make_async_copy(stE, se_out.at[r, t], sem)
        ce.start()
        ce.wait()
        co = pltpu.make_async_copy(stO, so_out.at[r, t], sem)
        co.start()
        co.wait()
        return 0

    jax.lax.fori_loop(0, nsamples, sample_block, 0)
    jax.lax.fori_loop(0, rem, lambda _, c: (full_sweep(ts), c)[1], 0)
    e_out[0] = eS[:].astype(jnp.int8)
    o_out[0] = oS[:].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("nsweeps",))
def _call(E, O, seeds, dE, beta_arr, nsweeps: int):
    R, L, W = E.shape
    spec = pl.BlockSpec((1, L, W), lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seeds, dE table, beta schedule
        grid=(R,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.VMEM((L, W), jnp.int32), pltpu.VMEM((L, W), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, nsweeps=nsweeps, blen=int(beta_arr.shape[0])),
        out_shape=(
            jax.ShapeDtypeStruct((R, L, W), jnp.int8),
            jax.ShapeDtypeStruct((R, L, W), jnp.int8),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=15 * R * L * W * nsweeps * 2,
            bytes_accessed=4 * R * L * W,
            transcendentals=20 * nsweeps,
        ),
    )(seeds, dE, beta_arr, E, O)


@functools.partial(jax.jit, static_argnames=("freq", "nsamples", "rem"))
def _call_sample(E, O, seeds, dE, beta_arr, freq: int, nsamples: int, rem: int):
    R, L, W = E.shape
    Wp = -(-W // 128) * 128  # HBM DMA slices must be 128-lane aligned
    spec = pl.BlockSpec((1, L, W), lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM)
    # sample stacks stay in HBM (pinned: ANY would let small buffers land in
    # VMEM, where the per-sample DMA slice fails to lower) and are DMA'd into
    hbm_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seeds, dE table, beta
        grid=(R,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, hbm_spec, hbm_spec),
        scratch_shapes=[
            pltpu.VMEM((L, W), jnp.int32),
            pltpu.VMEM((L, W), jnp.int32),
            pltpu.VMEM((L, Wp), jnp.int8),
            pltpu.VMEM((L, Wp), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nsweeps = freq * nsamples + rem
    return pl.pallas_call(
        functools.partial(_kernel_sample, freq=freq, nsamples=nsamples, rem=rem),
        out_shape=(
            jax.ShapeDtypeStruct((R, L, W), jnp.int8),
            jax.ShapeDtypeStruct((R, L, W), jnp.int8),
            jax.ShapeDtypeStruct((R, nsamples, L, Wp), jnp.int8),
            jax.ShapeDtypeStruct((R, nsamples, L, Wp), jnp.int8),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=15 * R * L * W * nsweeps * 2,
            bytes_accessed=4 * R * L * W + 2 * R * nsamples * L * Wp,
            transcendentals=20,
        ),
    )(seeds, dE, beta_arr, E, O)


@functools.partial(jax.jit, static_argnames=("freq", "nsamples", "rem"))
def _run_packed_sample(s, seeds, dE, beta_arr, freq: int, nsamples: int, rem: int):
    E, O = pack_checkerboard(s)
    W = E.shape[2]
    E2, O2, SE, SO = _call_sample(E, O, seeds, dE, beta_arr, freq, nsamples, rem)
    return unpack_checkerboard(E2, O2), unpack_checkerboard(SE[..., :W], SO[..., :W])


def run_sampling_2d_pallas(s, seeds_u32, beta, j: float, h: float,
                           freq: int, nsamples: int, rem: int):
    """Fused sampling on ``s[R, L, L]`` int8: ``nsamples`` blocks of ``freq``
    sweeps (state recorded after each block, on device) then ``rem`` trailing
    sweeps. Returns (final_s [R, L, L], samples [R, nsamples, L, L] int8)."""
    dE = jnp.asarray(_dE_values(j, h))
    beta_arr = jnp.full(1, beta, jnp.float32)
    return _run_packed_sample(s, seeds_u32, dE, beta_arr, int(freq), int(nsamples), int(rem))


# ------------------------------------------------------------- testing path
#
# Interpret-mode emulation of the hardware PRNG returns zeros, so the fused
# kernel cannot be validated on CPU as-is. This variant takes the 31-bit
# random integers as an explicit input ([2*nsweeps, L, W], one plane per
# phase) and is asserted bit-exact against a numpy reference of the same
# algorithm in tests/test_pallas_interpret.py. Single-strip sizes only.


def _kernel_testbits(dE_ref, beta_ref, rb_ref, e_in, o_in, e_out, o_out, *, nsweeps: int, blen: int):
    L, W = e_in.shape[1], e_in.shape[2]
    eS = e_in[0].astype(jnp.int32)
    oS = o_in[0].astype(jnp.int32)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (L, W), 0) % 2

    def thresholds(beta):
        return [
            (jax.nn.sigmoid(-beta * dE_ref[k]) * 2147483647.0).astype(jnp.int32)
            for k in range(10)
        ]

    def select_thr(ts, s, B):
        def chain(base):
            t = jnp.full((L, W), ts[base + 4], jnp.int32)
            for k, bv in enumerate((-4, -2, 0, 2)):
                t = jnp.where(B == bv, ts[base + k], t)
            return t

        return jnp.where(s > 0, chain(5), chain(0))

    def phase(upd, oth, even_phase, ts, rb31):
        up = pltpu.roll(oth, 1, 0)
        dn = pltpu.roll(oth, L - 1, 0)
        rollp = pltpu.roll(oth, 1, 1)
        rollm = pltpu.roll(oth, W - 1, 1)
        if even_phase:
            horiz = jnp.where(rowp == 0, rollp, rollm)
        else:
            horiz = jnp.where(rowp == 0, rollm, rollp)
        B = up + dn + oth + horiz
        acc = rb31 <= select_thr(ts, upd, B)
        return jnp.where(acc, -upd, upd)

    def sweep(t, carry):
        eS, oS = carry
        beta = beta_ref[t % blen] if blen > 1 else beta_ref[0]
        ts = thresholds(beta)
        eS = phase(eS, oS, True, ts, rb_ref[2 * t])
        oS = phase(oS, eS, False, ts, rb_ref[2 * t + 1])
        return eS, oS

    eS, oS = jax.lax.fori_loop(0, nsweeps, sweep, (eS, oS))
    e_out[0] = eS.astype(jnp.int8)
    o_out[0] = oS.astype(jnp.int8)


def run_steps_2d_testbits(s, rb31, beta_arr, j: float, h: float):
    """Deterministic variant for kernel validation: ``rb31[2*T, L, L/2]``
    int32 in [0, 2^31) supplies the per-phase acceptance randoms (plane k
    is used by sweep k//2, phase k%2, in packed-checkerboard layout)."""
    bnp = np.asarray(beta_arr, np.float32)
    nsweeps = int(bnp.shape[0])
    E, O = pack_checkerboard(s)
    R, L, W = E.shape
    assert R == 1 and L % 2 == 0  # interpret-mode validation sizes
    dE = jnp.asarray(_dE_values(j, h))
    spec = pl.BlockSpec((1, L, W), lambda *_: (0, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rb planes, full array
            spec,
            spec,
        ],
        out_specs=(spec, spec),
    )
    E2, O2 = pl.pallas_call(
        functools.partial(_kernel_testbits, nsweeps=nsweeps, blen=nsweeps),
        out_shape=(
            jax.ShapeDtypeStruct((1, L, W), jnp.int8),
            jax.ShapeDtypeStruct((1, L, W), jnp.int8),
        ),
        grid_spec=grid_spec,
    )(dE, jnp.asarray(bnp), jnp.asarray(rb31, jnp.int32), E, O)
    return unpack_checkerboard(E2, O2)


@functools.partial(jax.jit, static_argnames=("nsweeps",))
def _run_packed(s, seeds, dE, beta_arr, nsweeps: int):
    E, O = pack_checkerboard(s)
    E, O = _call(E, O, seeds, dE, beta_arr, nsweeps)
    return unpack_checkerboard(E, O)


def run_steps_2d_pallas(s, seeds_u32, beta_arr, j: float, h: float):
    """Run ``len(beta_arr)`` checkerboard sweeps on ``s[R, L, L]`` int8 with
    per-replica PRNG seeds ``seeds_u32[R]`` (int32). Returns final s."""
    bnp = np.asarray(beta_arr, np.float32)
    nsweeps = int(bnp.shape[0])
    if nsweeps == 0:
        return s
    if nsweeps > 1 and np.all(bnp == bnp[0]):
        bnp = bnp[:1]  # constant beta: keep the SMEM schedule buffer tiny
    dE = jnp.asarray(_dE_values(j, h))
    return _run_packed(s, seeds_u32, dE, jnp.asarray(bnp), nsweeps)
