"""Pallas torus-kernel validation on CPU.

Interpret-mode emulation of the TPU hardware PRNG returns zeros, so the
stochastic kernel can't be driven directly; instead the deterministic
``run_steps_2d_testbits`` variant takes explicit random planes and must match
a numpy reference of the identical algorithm **bit-exactly**."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax
from jax.experimental.pallas import tpu as pltpu

from pyisingmontecarlo_tpu.ops import sq2d_pallas as sp


def numpy_reference(s0, rb, betas, j, h):
    """Same algorithm in plain numpy: checkerboard Glauber with quantized
    int31 thresholds; rb[2t+phase] is the packed-layout random plane."""
    L = s0.shape[0]
    W = L // 2
    s = s0.astype(np.int64).copy()
    dE_vals = sp._dE_values(j, h)  # order: s=-1 B=(-4..4), s=+1 B=(-4..4)
    for t, beta in enumerate(betas):
        # thresholds with the kernel's f32 sigmoid quantization
        thr10 = np.asarray(
            jax.nn.sigmoid(jnp.float32(-beta) * jnp.asarray(dE_vals)) * 2147483647.0
        ).astype(np.int32)
        for phase in (0, 1):
            plane = rb[2 * t + phase]  # [L, W]
            new = s.copy()
            for x in range(L):
                for k in range(W):
                    y = 2 * k + (x % 2 if phase == 0 else 1 - x % 2)
                    B = (
                        s[(x - 1) % L, y]
                        + s[(x + 1) % L, y]
                        + s[x, (y - 1) % L]
                        + s[x, (y + 1) % L]
                    )
                    base = 5 if s[x, y] > 0 else 0
                    thr = thr10[base + (B + 4) // 2]
                    if plane[x, k] <= thr:
                        new[x, y] = -s[x, y]
            s = new
    return s.astype(np.int8)


def test_kernel_bit_exact_vs_numpy_reference():
    L, T = 16, 5
    rng = np.random.default_rng(0)
    s0 = (rng.integers(0, 2, (L, L)).astype(np.int8) * 2 - 1)
    rb = rng.integers(0, 2**31, size=(2 * T, L, L // 2), dtype=np.int64).astype(np.int32)
    betas = np.array([0.2, 0.35, 0.5, 0.8, 1.2], np.float32)

    with pltpu.force_tpu_interpret_mode():
        out_k = np.asarray(
            sp.run_steps_2d_testbits(jnp.asarray(s0[None]), rb, betas, -1.0, 0.0)
        )[0]
    out_np = numpy_reference(s0, rb, betas, -1.0, 0.0)
    np.testing.assert_array_equal(out_k, out_np)


def test_kernel_bit_exact_with_field():
    L, T = 16, 3
    rng = np.random.default_rng(7)
    s0 = (rng.integers(0, 2, (L, L)).astype(np.int8) * 2 - 1)
    rb = rng.integers(0, 2**31, size=(2 * T, L, L // 2), dtype=np.int64).astype(np.int32)
    betas = np.array([0.6, 0.6, 0.6], np.float32)
    with pltpu.force_tpu_interpret_mode():
        out_k = np.asarray(
            sp.run_steps_2d_testbits(jnp.asarray(s0[None]), rb, betas, 0.5, -0.3)
        )[0]
    out_np = numpy_reference(s0, rb, betas, 0.5, -0.3)
    np.testing.assert_array_equal(out_k, out_np)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 2, (3, 8, 8)).astype(np.int8) * 2 - 1)
    E, O = sp.pack_checkerboard(s)
    np.testing.assert_array_equal(np.asarray(sp.unpack_checkerboard(E, O)), np.asarray(s))


def test_frozen_and_forced_limits():
    # rb = max int31: flip only if threshold is exactly 2^31-1 (p ~ 1)
    # rb = 0: always flip (threshold >= 0 always)
    L = 8
    s0 = np.ones((L, L), np.int8)
    hi = np.full((2, L, L // 2), 2**31 - 1, np.int32)
    lo = np.zeros((2, L, L // 2), np.int32)
    with pltpu.force_tpu_interpret_mode():
        frozen = np.asarray(
            sp.run_steps_2d_testbits(jnp.asarray(s0[None]), hi, np.array([5.0], np.float32), -1.0, 0.0)
        )[0]
        flipped = np.asarray(
            sp.run_steps_2d_testbits(jnp.asarray(s0[None]), lo, np.array([5.0], np.float32), -1.0, 0.0)
        )[0]
    assert (frozen == 1).all()  # aligned FM at beta=5: p(flip) ~ e^-40
    assert (flipped == -1).all()  # every site flipped once per sweep
