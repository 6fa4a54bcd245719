"""Spatially-sharded classical sweeps: one huge lattice split across chips.

The reference has *no* within-replica parallelism at all (each simulator is
strictly sequential on one thread; SURVEY.md section 2.3). On TPU a single
lattice too large for one chip shards along a spatial axis: each device owns a
column slab ``[R, Lx, Ly/n]``, exchanges one-column halos with its ring
neighbors via ``lax.ppermute`` before each checkerboard phase, and updates its
slab locally. This is the explicit shard_map/ICI path (the halo exchange is
latency-bound, one column per phase — negligible vs the slab update).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

__all__ = ["sharded_sweeps_2d", "dryrun_spatial"]

_F = jnp.float32
_S = jnp.int8


def _halo_cols(s_local, axis_name: str):
    """Fetch the neighbor boundary columns over the space ring.

    Returns (left_halo, right_halo): the column that sits to the left/right of
    this device's slab (periodic)."""
    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]  # send to right neighbor
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left = lax.ppermute(s_local[:, :, -1:], axis_name, fwd)  # from left nbr
    right = lax.ppermute(s_local[:, :, :1], axis_name, bwd)  # from right nbr
    return left, right


def _phase_update(s_local, u, beta, j, h, parity, y0, axis_name):
    left, right = _halo_cols(s_local, axis_name)
    ext = jnp.concatenate([left, s_local, right], axis=2)
    B = (
        jnp.roll(s_local, 1, axis=1)
        + jnp.roll(s_local, -1, axis=1)
        + ext[:, :, :-2]
        + ext[:, :, 2:]
    ).astype(_F)
    dE = -2.0 * s_local.astype(_F) * (j * B + h)
    Lx, Lyl = s_local.shape[1], s_local.shape[2]
    x = lax.broadcasted_iota(jnp.int32, (Lx, Lyl), 0)
    y = lax.broadcasted_iota(jnp.int32, (Lx, Lyl), 1) + y0
    mask = ((x + y) % 2) == parity
    # Glauber acceptance (parallel checkerboard; see engines/classical.py)
    acc = (u < jax.nn.sigmoid(-beta * dE)) & mask[None]
    return jnp.where(acc, -s_local, s_local)


def _sweeps_local(s_local, key, beta, j, h, sweeps: int, axis_name: str, replica_axis):
    idx = lax.axis_index(axis_name)
    y0 = idx * s_local.shape[2]
    key = jax.random.fold_in(key, idx)
    if replica_axis is not None:
        key = jax.random.fold_in(key, lax.axis_index(replica_axis) + 1000)

    def body(carry, t):
        s, key = carry
        for parity in (0, 1):
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, s.shape)
            s = _phase_update(s, u, beta, j, h, parity, y0, axis_name)
        return (s, key), None

    (s_local, _), _ = lax.scan(body, (s_local, key), jnp.arange(sweeps))
    return s_local


def sharded_sweeps_2d(
    mesh: Mesh,
    s,
    key,
    beta: float,
    j: float,
    h: float,
    sweeps: int,
    space_axis: str = "space",
    replica_axis=None,
):
    """Run ``sweeps`` checkerboard sweeps on ``s[R, Lx, Ly]`` with Ly sharded
    over ``space_axis`` (and optionally R over ``replica_axis``)."""
    rspec = replica_axis if replica_axis in mesh.axis_names else None
    in_spec = P(rspec, None, space_axis)

    fn = _shard_map(
        partial(
            _sweeps_local,
            beta=jnp.float32(beta),
            j=jnp.float32(j),
            h=jnp.float32(h),
            sweeps=int(sweeps),
            axis_name=space_axis,
            replica_axis=rspec,
        ),
        mesh=mesh,
        in_specs=(in_spec, P()),
        out_specs=in_spec,
    )
    return jax.jit(fn)(s, key)


def dryrun_spatial(mesh: Mesh, L: int, replicas: int, sweeps: int):
    """Tiny-shape dry run of the halo-exchange sweep on the given mesh."""
    space_axis = "space" if "space" in mesh.axis_names else mesh.axis_names[-1]
    replica_axis = "replica" if "replica" in mesh.axis_names else None
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 2, (replicas, L, L)).astype(np.int8) * 2 - 1)
    key = jax.random.key(0)
    out = sharded_sweeps_2d(
        mesh, s, key, beta=0.5, j=-1.0, h=0.0, sweeps=sweeps,
        space_axis=space_axis, replica_axis=replica_axis,
    )
    out = np.asarray(out)
    assert out.shape == (replicas, L, L)
    assert set(np.unique(out)).issubset({-1, 1})
    return out
