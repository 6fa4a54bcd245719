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

__all__ = ["make_mesh", "replica_sharding", "P", "NamedSharding"]


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
