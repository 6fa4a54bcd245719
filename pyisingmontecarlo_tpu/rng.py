"""RNG discipline: master seed fan-out to per-experiment counter-based keys.

Reference contract (/root/reference/src/lattice.rs:83-91 and the parallel
sites listed in SURVEY.md section 2.1 row 7): one master RNG — seeded from
``seed_gen`` or from entropy — draws one u64 per experiment; each simulator is
then seeded independently so experiments are reproducible and order-free.

TPU-native realization: the master is a numpy PCG64 stream (host side, cheap);
each experiment's u64 seed becomes a **counter-based threefry2x32 key**
(`jax.random`), so all per-experiment randomness is generated on device with no
sequential state. The trajectory of experiment ``i`` depends only on its seed,
never on the batch size or the other experiments.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MasterRng", "keys_from_seeds", "split_keys", "fold_all"]


class MasterRng:
    """Master seed generator mirroring the reference's ``SmallRng`` master.

    ``seed_gen=None`` seeds from OS entropy (reference: ``SmallRng::from_entropy``,
    lattice.rs:62-67); a fixed ``seed_gen`` gives bit-identical seed sequences
    across reruns. Successive ``make_seeds`` calls advance the stream, exactly
    like the reference's ``&mut self.rng`` usage.
    """

    def __init__(self, seed_gen: Optional[int] = None):
        self.seed_gen = seed_gen
        self._gen = np.random.Generator(np.random.PCG64(seed_gen))

    def reset(self, seed_gen: Optional[int]) -> None:
        """Mirrors ``set_seed_gen`` (lattice.rs:78-80)."""
        self.seed_gen = seed_gen
        self._gen = np.random.Generator(np.random.PCG64(seed_gen))

    def make_seeds(self, num_experiments: int) -> np.ndarray:
        """One u64 per experiment (lattice.rs:83-91). Returns uint64[n]."""
        n = int(num_experiments)
        if n < 0:
            raise ValueError("num_experiments must be non-negative")
        # one draw per experiment so seed i is independent of the batch size
        return self._gen.integers(0, 2**64, size=n, dtype=np.uint64)

    def next_seed(self) -> int:
        return int(self.make_seeds(1)[0])

    def clone(self) -> "MasterRng":
        other = MasterRng(self.seed_gen)
        other._gen = np.random.Generator(np.random.PCG64())
        other._gen.bit_generator.state = self._gen.bit_generator.state
        return other


def keys_from_seeds(seeds: np.ndarray) -> jax.Array:
    """uint64[n] seeds -> typed threefry key array [n] (device-resident)."""
    seeds = np.asarray(seeds, dtype=np.uint64)
    data = np.stack(
        [(seeds >> np.uint64(32)).astype(np.uint32), (seeds & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
        axis=-1,
    )
    return jax.random.wrap_key_data(jnp.asarray(data), impl="threefry2x32")


def split_keys(keys: jax.Array):
    """Split a batched key array [R] -> (next_keys [R], subkeys [R])."""
    ks = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return ks[:, 0], ks[:, 1]


def fold_all(keys: jax.Array, data) -> jax.Array:
    """fold_in a scalar into every key of a batched key array."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, data)
