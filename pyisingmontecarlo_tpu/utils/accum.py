"""Compensated (Neumaier) f32 accumulation for long scan loops.

TPU compute is f32; a plain f32 running sum of per-sweep energies loses
~log10(n) significant digits over n sweeps (at 1024^2, |E| ~ 2e6, 16k sweeps
drop ~3 digits — SURVEY.md §7 hard-part 4). The fix the reference never needed
(its Rust engines accumulate in f64, e.g. the energy fold inside
`timesteps`/`timesteps_measure`, /root/reference/src/lattice.rs:905-921 call
sites) is Neumaier's compensated pair: carry (hi, lo) where every add folds its
exact f32 rounding error into ``lo``. The collapsed result ``hi + lo`` matches
an f64 accumulation of the same f32 addends to ~1e-10 relative, independent of
the sweep count.

The pair is a pytree, so it drops into `lax.scan` / `lax.fori_loop` carries
unchanged. XLA does not reassociate f32 adds, so the error-extraction
expression `(big - s) + small` survives compilation intact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["kzero", "kadd", "ktotal", "kfinal"]


def kzero(shape, dtype=jnp.float32):
    """Fresh compensated accumulator (hi, lo) of the given shape."""
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def kadd(acc, x):
    """acc + x with Neumaier error compensation (exact for any |hi| vs |x|)."""
    hi, lo = acc
    s = hi + x
    swap = jnp.abs(hi) >= jnp.abs(x)
    big = jnp.where(swap, hi, x)
    small = jnp.where(swap, x, hi)
    return s, lo + ((big - s) + small)


def ktotal(acc):
    """Collapse the pair inside jit (f32 result — rounds to ~6e-8 relative).

    Use only where a device-resident f32 is required; for final results
    prefer ``kfinal`` (host f64 collapse, keeps the full pair precision)."""
    hi, lo = acc
    return hi + lo


def kfinal(acc):
    """Host-side collapse to numpy f64: the pair's full precision survives.

    jit-compiled code cannot produce f64 on TPU (x64 is disabled), so drivers
    return the (hi, lo) pair and callers collapse here."""
    hi, lo = acc
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
