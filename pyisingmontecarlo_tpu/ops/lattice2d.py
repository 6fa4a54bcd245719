"""Fast path for uniform-J periodic square lattices (the benchmark workload).

The generic engine (engines/classical.py) works on arbitrary graphs through
gathers over compiled adjacency. When ``graph.detect_square_torus`` recognizes
an L x L periodic lattice with uniform coupling, classical runs dispatch here:
spins live as an ``[R, L, L]`` int8 tensor, neighbor fields are four ``roll``s
(no gathers), and the checkerboard (2-coloring) update runs both parities per
sweep. This is the XLA formulation; ops/sq2d_pallas.py holds the fused Pallas
kernel used on TPU for large lattices (spins resident in VMEM across sweeps,
hardware PRNG, acceptance via threshold tables).

Bench target (BASELINE.json north star): >= 50 attempted spin flips/ns/chip at
1024^2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..rng import split_keys

__all__ = ["run_steps_2d", "run_sampling_2d", "energy_2d", "random_states_2d"]

_F = jnp.float32
_S = jnp.int8


def random_states_2d(keys, L: int):
    def one(k):
        return jax.random.bernoulli(k, 0.5, (L, L)).astype(_S) * 2 - 1

    return jax.vmap(one)(keys)


@jax.jit
def energy_2d(s, j, h):
    """E[r] = J * sum_<ab> s_a s_b + h * sum_i s_i (each bond once)."""
    sf = s.astype(_F)
    bonds = (sf * jnp.roll(sf, -1, axis=1)).sum((1, 2)) + (
        sf * jnp.roll(sf, -1, axis=2)
    ).sum((1, 2))
    return j * bonds + h * sf.sum((1, 2))


def _parity_mask(L: int, parity: int):
    x = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return ((x + y) % 2) == parity


def _color_update_2d(s, u, beta, j, h, parity_mask):
    # neighbor sum in int8 (|B| <= 4), then f32 local field
    B = (
        jnp.roll(s, 1, axis=1)
        + jnp.roll(s, -1, axis=1)
        + jnp.roll(s, 1, axis=2)
        + jnp.roll(s, -1, axis=2)
    ).astype(_F)
    dE = -2.0 * s.astype(_F) * (j * B + h)
    # Glauber acceptance (parallel checkerboard; see engines/classical.py)
    acc = (u < jax.nn.sigmoid(-beta * dE)) & parity_mask[None]
    return jnp.where(acc, -s, s)


def sweep_2d(s, keys, beta, j, h):
    L = s.shape[1]
    for parity in (0, 1):
        keys, sub = split_keys(keys)
        u = jax.vmap(lambda k: jax.random.uniform(k, (L, L)))(sub)
        s = _color_update_2d(s, u, beta, j, h, _parity_mask(L, parity))
    return s, keys


@jax.jit
def _steps_2d(s, keys, beta_arr, j, h):
    def body(carry, beta):
        s, keys = carry
        s, keys = sweep_2d(s, keys, beta, j, h)
        return (s, keys), None

    (s, keys), _ = lax.scan(body, (s, keys), beta_arr)
    return s, keys


@jax.jit
def _steps_energies_2d(s, keys, beta_arr, j, h):
    def body(carry, beta):
        s, keys = carry
        s, keys = sweep_2d(s, keys, beta, j, h)
        return (s, keys), energy_2d(s, j, h)

    (s, keys), es = lax.scan(body, (s, keys), beta_arr)
    return s, keys, es.T


def _pallas_seeds(keys):
    """Derive per-replica int32 PRNG seeds from typed threefry keys."""
    data = jax.random.key_data(keys)  # [R, 2] uint32
    return (data[:, 0] ^ jnp.uint32(0x9E3779B9) ^ (data[:, 1] << 1)).astype(jnp.int32)


def run_steps_2d(s, keys, beta_arr, j, h, collect_energies=False):
    if not collect_energies:
        from . import sq2d_pallas as sp

        # j/h must stay host scalars here: a float() on a device value would
        # force a blocking scalar readback before every kernel launch
        if sp.supported(s.shape[1]):
            from ..rng import fold_all

            s = sp.run_steps_2d_pallas(s, _pallas_seeds(keys), beta_arr, float(j), float(h))
            return s, fold_all(keys, beta_arr.shape[0])
    j = jnp.float32(j)
    h = jnp.float32(h)
    if collect_energies:
        return _steps_energies_2d(s, keys, beta_arr, j, h)
    return _steps_2d(s, keys, beta_arr, j, h)


@partial(jax.jit, static_argnames=("timesteps", "sampling_freq"))
def _sampling_2d_xla(s, keys, beta, j, h, timesteps, sampling_freq):
    nsamples = timesteps // sampling_freq

    def block(carry, _):
        s, keys = carry
        for _ in range(sampling_freq):
            s, keys = sweep_2d(s, keys, beta, j, h)
        return (s, keys), (energy_2d(s, j, h), s)

    (s, keys), (es, ss) = lax.scan(block, (s, keys), None, length=nsamples)
    rem = timesteps - nsamples * sampling_freq
    for _ in range(rem):
        s, keys = sweep_2d(s, keys, beta, j, h)
    return s, keys, es.T, jnp.swapaxes(ss, 0, 1)


@jax.jit
def _energies_from_samples(ss, j, h):
    """energy_2d over a [R, T, L, L] int8 sample stack -> [R, T].

    Scans one sample slice at a time (a full-stack f32 materialization OOMs
    at 1024^2 x 256 samples) and reduces bond/spin sums in int32 — exact for
    L^2 < 2^24, so the final f32 energy has only the two j/h multiplies'
    rounding."""

    def one(st):  # [R, L, L] int8
        bonds = (st * jnp.roll(st, -1, axis=1)).sum((1, 2), dtype=jnp.int32) + (
            st * jnp.roll(st, -1, axis=2)
        ).sum((1, 2), dtype=jnp.int32)
        spins = st.sum((1, 2), dtype=jnp.int32)
        return j * bonds.astype(_F) + h * spins.astype(_F)

    return lax.map(one, jnp.moveaxis(ss, 1, 0)).T


def run_sampling_2d(s, keys, beta, j, h, timesteps, sampling_freq):
    from . import sq2d_pallas as sp

    timesteps = int(timesteps)
    sampling_freq = int(sampling_freq)
    if not sp.supported(s.shape[1]):
        return _sampling_2d_xla(s, keys, beta, j, h, timesteps, sampling_freq)
    from ..rng import fold_all

    nsamples = timesteps // sampling_freq
    rem = timesteps - nsamples * sampling_freq
    if nsamples == 0:
        if rem:
            s, keys = run_steps_2d(s, keys, jnp.full(rem, beta, jnp.float32), j, h)
        R = s.shape[0]
        return s, keys, jnp.zeros((R, 0), _F), jnp.zeros((R, 0) + s.shape[1:], _S)
    # fused kernel: all sample blocks in ONE dispatch, states staged to HBM
    # on device (round 1 paid ~ms of dispatch per sample block)
    s, ss = sp.run_sampling_2d_pallas(
        s, _pallas_seeds(keys), float(beta), float(j), float(h),
        sampling_freq, nsamples, rem,
    )
    keys = fold_all(keys, timesteps)
    es = _energies_from_samples(ss, jnp.float32(j), jnp.float32(h))
    return s, keys, es, ss
