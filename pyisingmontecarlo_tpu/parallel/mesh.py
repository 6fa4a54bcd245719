"""Device-mesh helpers.

The reference is single-node shared-memory only (rayon threads; SURVEY.md
section 2.3 parallelism table) — its only cross-replica communication is the
in-memory tempering swap. The TPU build scales through ``jax.sharding.Mesh``:
the replica/ladder axis is the data-parallel axis, large lattices shard
spatially, and swap/halo traffic rides ICI collectives.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replica_sharding",
    "init_distributed",
    "global_mesh",
    "P",
    "NamedSharding",
]


def make_mesh(
    shape: Tuple[int, ...],
    axis_names: Tuple[str, ...],
    devices: Optional[Sequence] = None,
) -> Mesh:
    n = math.prod(shape)
    devices = list(devices) if devices is not None else jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(shape), axis_names)


def replica_sharding(mesh: Mesh, ndim: int, axis: str = "replica") -> NamedSharding:
    """NamedSharding placing array axis 0 (replicas) on the mesh axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (pod / multi-node) initialization: one call per process.

    Wraps ``jax.distributed.initialize``. On Cloud TPU pods every argument is
    auto-detected from the TPU metadata server, so ``init_distributed()`` with
    no arguments is the whole story; on other clusters pass the coordinator's
    ``host:port``, the process count, and this process's rank. After this call
    ``jax.devices()`` is the GLOBAL device list and ``make_mesh``/``global_mesh``
    build meshes spanning hosts — tempering swaps and halo exchanges then ride
    ICI/DCN collectives with no further code changes (replica arrays are
    sharded over mesh axes exactly as in the single-process path).

    The reference has no distributed story at all (SURVEY.md §2.3: rayon
    shared-memory threads, single node only) — this is TPU-native surface.

    Call before any other JAX API (backend initialization is sticky). Safe to
    call when already initialized (no-op).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized — keep going
        if "already" not in str(e).lower():
            raise


def global_mesh(
    replica_axis: str = "replica",
    per_host_axes: Tuple[Tuple[str, int], ...] = (),
) -> Mesh:
    """Mesh over ALL global devices: leading ``replica_axis`` spans hosts
    (pure data parallelism — zero communication except tempering swaps),
    trailing ``per_host_axes`` (name, size) factors split within the replica
    dimension for spatial sharding (parallel/spatial.py halo exchange).

    Example (4 hosts x 8 chips, 2-way spatial): ``global_mesh("replica",
    (("x", 2),))`` -> Mesh of shape (16, 2) over 32 chips.
    """
    devs = jax.devices()
    inner = math.prod(s for _, s in per_host_axes) if per_host_axes else 1
    if len(devs) % inner:
        raise ValueError(
            f"{len(devs)} devices not divisible by inner axes product {inner}"
        )
    shape = (len(devs) // inner, *(s for _, s in per_host_axes))
    names = (replica_axis, *(n for n, _ in per_host_axes))
    return Mesh(np.array(devs).reshape(shape), names)
