"""Multi-chip parallel tempering: the beta ladder sharded over a device mesh.

SURVEY.md section 7 design: replicas of the ladder shard across chips
(data-parallel axis); the swap step's neighbor log-weight comparison uses
``jnp.roll`` along the replica axis, which XLA's SPMD partitioner lowers to a
``collective-permute`` over ICI when that axis is sharded — the reference's
sequential single-threaded swap barrier (tempering.rs:191-194) becomes a pair
of conflict-free even/odd exchange phases riding the interconnect.

The implementation is the *same* jitted program as the single-chip ladder
(tempering.run_tempering_sampled): GSPMD propagates the input shardings through the
sweeps (embarrassingly parallel over replicas) and inserts collectives only at
the swap. ``shard_ladder`` places a LatticeTempering's arrays on the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tempering as tp
from ..engines import worldline as wl

__all__ = ["shard_ladder", "dryrun_ladder"]


def shard_ladder(lt: "tp.LatticeTempering", mesh: Mesh, axis: str = "replica") -> None:
    """Place a materialized LatticeTempering ladder on a device mesh with the
    replica axis sharded. Subsequent qmc_timesteps* calls run SPMD; swap
    collectives cross shard boundaries automatically."""
    m = lt._materialize()
    R = len(lt.graphs)
    n = mesh.shape[axis]
    if R % n != 0:
        raise ValueError(f"ngraphs ({R}) must be divisible by mesh axis '{axis}' ({n})")

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    m["s"] = put(m["s"], P(axis, None, None))
    m["keys"] = put(m["keys"], P(axis))
    m["p"] = type(m["p"])(*[put(x, P(axis)) for x in m["p"]])
    m["hb_mask"] = put(m["hb_mask"], P(axis))
    m["rvb_mask"] = put(m["rvb_mask"], P(axis))
    if m["ladder"] is not None:
        # GSPMD cannot partition a pallas_call; record the mesh so the sweep
        # is issued inside shard_map — each device runs its own kernel on its
        # replica shard (tempering._mixed_sweep; VERDICT round-2 item 7). The
        # parameter planes are replica-major along the flattened lane axis,
        # sharded to match the state's replica shards.
        m["ladder"]["mesh"] = mesh
        m["ladder"]["axis"] = axis
        m["ladder"]["planes"] = jax.tree.map(
            lambda x: put(x, P(None, axis)), m["ladder"]["planes"]
        )


def dryrun_ladder(
    mesh: Mesh, replicas_per_device: int, nvars: int, ltau: int, timesteps: int
) -> np.ndarray:
    """One full sharded tempering step on tiny shapes (driver dry run): builds
    a ring-graph beta ladder, shards it over the mesh, runs sweeps + swap
    phases, returns per-replica energy sums."""
    n = mesh.devices.size
    R = replicas_per_device * n
    edges = [((i, (i + 1) % nvars), -1.0) for i in range(nvars)]
    lt = tp.LatticeTempering(edges, seed=0)
    for b in np.linspace(0.5, 1.5, R):
        lt.add_graph(1.0, 0.0, float(b))
    axis = mesh.axis_names[0]
    shard_ladder(lt, mesh, axis=axis)
    m = lt._materialize()
    # force the tau-grid small for the dry run: regrid to ltau
    if m["L"] != ltau:
        idx = (np.arange(ltau) * m["L"] // ltau).astype(np.int32)
        m["s"] = jax.device_put(
            jnp.take(m["s"], jnp.asarray(idx), axis=2), NamedSharding(mesh, P(axis, None, None))
        )
        betas = np.array([g["beta"] for g in lt.graphs])
        gammas = np.array([g["transverse"] for g in lt.graphs])
        hs = np.array([g["longitudinal"] for g in lt.graphs])
        p = wl.make_params(betas, gammas, hs, ltau)
        m["p"] = type(p)(*[jax.device_put(x, NamedSharding(mesh, P(axis))) for x in p])
        m["L"] = ltau
    esum, _ = lt._run(timesteps, swap_freq=1)
    return np.asarray(esum)
