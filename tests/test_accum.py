"""Compensated f32 accumulation (utils/accum.py).

SURVEY.md §7 hard-part 4: the reference accumulates per-sweep energies in f64
(Rust); on TPU the running sum is f32, and a naive f32 sum of 16k values of
magnitude ~2e6 (the 1024^2 energy scale) loses ~3 significant digits. The
Neumaier pair must match an f64 accumulation of the same f32 addends to 1e-9
relative, and must survive a lax.scan carry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from pyisingmontecarlo_tpu.utils.accum import kadd, kfinal, kzero


def _addends(n=16384, scale=2.0e6, seed=0):
    rng = np.random.default_rng(seed)
    # energies cluster near -scale with sweep-to-sweep fluctuations — the
    # worst case for a naive running sum (large |sum| vs small increments)
    return (-scale + rng.normal(0.0, scale * 1e-3, size=n)).astype(np.float32)


def test_kahan_matches_f64_within_1e9():
    x = _addends()
    exact = np.sum(x.astype(np.float64))

    def body(acc, v):
        return kadd(acc, v), None

    acc, _ = lax.scan(body, kzero(()), jnp.asarray(x))
    got = float(kfinal(acc))
    assert abs(got - exact) / abs(exact) < 1e-9

    # the naive f32 sum must NOT meet that bound (the bug being fixed)
    naive = np.float32(0.0)
    for v in x:
        naive += v
    assert abs(float(naive) - exact) / abs(exact) > 1e-7


def test_kahan_batched_shape():
    x = np.asarray(_addends(4096), np.float32).reshape(512, 8)
    exact = x.astype(np.float64).sum(0)

    def body(acc, v):
        return kadd(acc, v), None

    acc, _ = lax.scan(body, kzero(8), jnp.asarray(x))
    got = kfinal(acc)
    assert got.shape == (8,)
    np.testing.assert_allclose(got, exact, rtol=1e-9)


def test_kahan_under_jit():
    x = jnp.asarray(_addends(1024))

    @jax.jit
    def f(x):
        def body(i, acc):
            return kadd(acc, x[i])

        return lax.fori_loop(0, x.shape[0], body, kzero(()))

    exact = np.sum(np.asarray(x, np.float64))
    assert abs(float(kfinal(f(x))) - exact) / abs(exact) < 1e-9


@pytest.mark.parametrize("engine", ["worldline", "generic"])
def test_drivers_still_return_plain_arrays(engine):
    """The drivers collapse the pair internally — public callers see [R] f32."""
    import pyisingmontecarlo_tpu as pmc

    if engine == "worldline":
        lat = pmc.Lattice([((0, 1), -1.0)], seed_gen=7)
        lat.set_transverse_field(1.0)
        es, _ = lat.run_quantum_monte_carlo(1.0, 32, 3)
        assert es.shape == (3,) and np.all(np.isfinite(es))
    else:
        r = pmc.QmcRunner(2, 3, seed=7)
        r.add_diagonal_interaction_and_offset([0.0, 1.0, 1.0, 0.0], [0, 1])
        es, _ = r.run_sampling(1.0, 32)
        assert es.shape == (3,) and np.all(np.isfinite(es))
