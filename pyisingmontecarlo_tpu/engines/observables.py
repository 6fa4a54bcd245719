"""Shared observable computations (autocorrelations).

The reference delegates autocorrelation measurement to the qmc crate's
``autocorrelations`` feature (calculate_{variable,spin_product,bond}_
autocorrelation call sites, /root/reference/src/lattice.rs:674-832,
qmcising.rs:297-404). We define the measured quantity explicitly: for each
scalar time series x(t) (per experiment, per channel), the mean-subtracted
normalized autocorrelation

    rho(lag) = sum_t (x(t)-xbar)(x(t+lag)-xbar) / sum_t (x(t)-xbar)^2

averaged over channels (variables / spin products / bonds), computed with an
FFT over the Monte Carlo time axis. Constant series contribute rho = 1 at
every lag (their fluctuation is identically zero; they are perfectly
correlated with themselves).
"""

from __future__ import annotations

import numpy as np

__all__ = ["autocorrelation", "autocorrelation_device"]


def pad_autocorr(corr: np.ndarray, timesteps: int) -> np.ndarray:
    """Reference output-shape quirk for the stateful classes (SURVEY.md 2.4.2):
    the binding zero-fills ``[n, timesteps]`` and copies the ``t/freq``-length
    autocorrelation series into the leading columns
    (/root/reference/src/qmcising.rs:306-321 ``Array::default`` + ``zip``)."""
    corr = np.asarray(corr, np.float64)
    timesteps = int(timesteps)
    if corr.shape[1] == timesteps:
        return corr
    out = np.zeros((corr.shape[0], timesteps), np.float64)
    out[:, : corr.shape[1]] = corr[:, :timesteps]
    return out


def autocorrelation(x: np.ndarray) -> np.ndarray:
    """x: [R, T, C] series -> rho[R, T] averaged over channels C."""
    x = np.asarray(x, np.float64)
    R, T, C = x.shape
    if T == 0:
        return np.zeros((R, 0))
    xc = x - x.mean(axis=1, keepdims=True)
    n = 1 << (2 * T - 1).bit_length()  # zero-pad to avoid circular wrap
    f = np.fft.rfft(xc, n=n, axis=1)
    acf = np.fft.irfft(f * np.conj(f), n=n, axis=1)[:, :T]  # [R, T, C]
    var = acf[:, :1, :].copy()
    const = var <= 1e-12
    var[const] = 1.0
    rho = acf / var
    rho = np.where(np.broadcast_to(const, rho.shape), 1.0, rho)
    return rho.mean(axis=2)


def autocorrelation_device(x) -> np.ndarray:
    """Same contract as :func:`autocorrelation`, computed ON DEVICE (jnp FFT
    over the MC-time axis, channel average on device); only the tiny
    ``rho[R, T]`` result crosses to host (VERDICT round-3 item 7: the host
    path shipped every ``[R, T, C]`` sample series to numpy — for the bond
    config that was the dominant cost of the whole measurement).

    Numerics: f32 FFT of O(1)-magnitude series; relative error ~ 1e-6*sqrt(n)
    — orders of magnitude below any Monte Carlo error bar. Host-vs-device
    agreement is pinned at 1e-4 absolute in tests/test_observables.py."""
    import jax.numpy as jnp

    R, T, C = x.shape
    if T == 0:
        return np.zeros((R, 0))
    x = jnp.asarray(x, jnp.float32)
    xc = x - x.mean(axis=1, keepdims=True)
    n = 1 << (2 * T - 1).bit_length()
    f = jnp.fft.rfft(xc, n=n, axis=1)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=n, axis=1)[:, :T]
    var = acf[:, :1, :]
    const = var <= 1e-12
    rho = jnp.where(const, 1.0, acf / jnp.where(const, 1.0, var))
    return np.asarray(rho.mean(axis=2), np.float64)
