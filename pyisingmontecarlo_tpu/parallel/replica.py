"""Replica-axis multi-chip sharding for the generic k-local engine (QmcRunner).

SURVEY.md §2.3: the reference's only parallelism is one OS thread per replica
(qmcrunner.rs:161-201 rayon fan-out). Here replicas are already a batch axis;
this module spreads that axis over a `jax.sharding.Mesh` so one QmcRunner
drives R replicas across N chips. Replicas never communicate, so the sharded
program is `shard_map` around the SAME sweep drivers — each device runs its
own independent block, zero collectives, and because every replica draws from
its own counter-based key stream (rng.py seed contract), the sharded run is
**bit-identical** to the unsharded one (pinned in tests/test_parallel.py).

Works with both generic-engine paths (group-major matmul and classic select
chains): the driver partials are wrapped, not reimplemented.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_runner", "shard_qmcising", "dryrun_runner"]


# All array outputs of the drivers carry the replica axis first (state, keys,
# compensated energy pairs, sample stacks), so a single P(axis) prefix serves
# as out_specs for the whole result pytree. Static loop bounds stay closed
# over (python ints); traced scalars/tables go through shard_map args with
# replicated specs.


# The drivers' leading ``tables`` pytree (the gm engine's detached device
# tables; () on the classic path) is replicated to every device — a P() prefix
# spec covers all of its leaves.


def _wrap_sweeps(drv, mesh: Mesh, axis: str):
    def run(tables, s, keys, *, timesteps, ltau, do_loop, offset):
        def body(tables, s, keys, offset):
            return drv(tables, s, keys, timesteps, ltau, do_loop, offset)

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P(axis), P(axis), P()),
            out_specs=P(axis), check_vma=False,
        )(tables, s, keys, offset)

    return jax.jit(run, static_argnames=("timesteps", "ltau", "do_loop"))


def _wrap_sample(drv, mesh: Mesh, axis: str):
    def run(tables, s, keys, *, timesteps, sampling_freq, ltau, do_loop,
            offset):
        def body(tables, s, keys, offset):
            return drv(
                tables, s, keys, timesteps, sampling_freq, ltau, do_loop,
                offset,
            )

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P(axis), P(axis), P()),
            out_specs=P(axis), check_vma=False,
        )(tables, s, keys, offset)

    return jax.jit(
        run, static_argnames=("timesteps", "sampling_freq", "ltau", "do_loop")
    )


def _wrap_bond(drv, mesh: Mesh, axis: str):
    def run(tables, s, keys, *, timesteps, sampling_freq, ltau, do_loop,
            offset, offsets_t, beta):
        def body(tables, s, keys, offset, offsets_t, beta):
            return drv(
                tables, s, keys, timesteps, sampling_freq, ltau, do_loop,
                offset, offsets_t, beta,
            )

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P(axis), P(axis), P(), P(), P()),
            out_specs=P(axis), check_vma=False,
        )(tables, s, keys, offset, offsets_t, beta)

    return jax.jit(
        run, static_argnames=("timesteps", "sampling_freq", "ltau", "do_loop")
    )


def shard_runner(q, mesh: Mesh, beta: float = 1.0, axis: str = "replica") -> None:
    """Shard a QmcRunner's replica batch over `mesh` along `axis`.

    Materializes the worldline at `beta` if needed, places state/keys with the
    replica axis partitioned, and swaps the jitted drivers for shard_map
    versions. Subsequent run_sampling/run_bond_sampling/autocorrelation calls
    run SPMD with zero cross-device traffic."""
    w = q._ensure(float(beta))
    ndev = mesh.shape[axis]
    R = w.s.shape[0]
    if R % ndev != 0:
        raise ValueError(
            f"num_experiments ({R}) must be divisible by mesh axis '{axis}' ({ndev})"
        )
    w.s = jax.device_put(w.s, NamedSharding(mesh, P(axis, None, None)))
    w.keys = jax.device_put(w.keys, NamedSharding(mesh, P(axis)))
    w._jit_sweeps = _wrap_sweeps(w._drv_sweeps, mesh, axis)
    w._jit_sample = _wrap_sample(w._drv_sample, mesh, axis)
    w._jit_bond = _wrap_bond(w._drv_bond, mesh, axis)


def shard_qmcising(q, mesh: Mesh, beta=None, axis: str = "replica") -> None:
    """Shard a QmcIsing's replica batch over `mesh` along `axis`.

    The worldline engine's drivers keep the replica axis leading everywhere
    (states [R, n, L], keys [R], per-replica WlParams), so GSPMD propagates
    the input shardings through the jitted sweeps with zero collectives — no
    shard_map wrapper needed. The fused Pallas fast path is disabled when
    sharding (GSPMD cannot partition a pallas_call; sharded ensembles run
    the XLA colored path, same trade the sharded tempering ladder makes on
    multi-device meshes via its own shard_map route).

    Sharding survives subsequent runs (jit outputs keep their shardings) but
    not a β-change regrid, which rebuilds arrays from host — re-call this
    after changing β."""
    w = q._ensure(beta)
    ndev = mesh.shape[axis]
    R = w.s.shape[0]
    if R % ndev != 0:
        raise ValueError(
            f"num_experiments ({R}) must be divisible by mesh axis '{axis}' ({ndev})"
        )
    w._pallas_dense = None

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    w.s = put(w.s, P(axis, None, None))
    w.keys = put(w.keys, P(axis))
    w.p = jax.tree.map(lambda x: put(x, P(axis)), w.p)


def dryrun_runner(mesh: Mesh, replicas_per_device: int = 2, nvars: int = 6,
                  timesteps: int = 2) -> np.ndarray:
    """One replica-sharded QmcRunner sampling step on tiny shapes (driver dry
    run): TFIM chain with an XX bond (off-diagonal 2-local — exercises the
    term-kink family) through the public API."""
    from ..qmcrunner import QmcRunner

    R = replicas_per_device * mesh.shape[mesh.axis_names[0]]
    q = QmcRunner(nvars, R, seed=3)
    zz = np.zeros(4)
    for idx in range(4):
        z0 = 1.0 if idx & 1 else -1.0
        z1 = 1.0 if idx & 2 else -1.0
        zz[idx] = -1.0 * z0 * z1
    xx = np.zeros((4, 4))
    for a in range(4):
        xx[a, a ^ 3] = -0.4
    for i in range(nvars):
        q.add_diagonal_interaction(zz, [i, (i + 1) % nvars])
        q.add_interaction(np.array([0.0, -0.8, -0.8, 0.0]), [i])
        q.add_interaction(xx.reshape(-1), [i, (i + 1) % nvars])
    shard_runner(q, mesh, beta=1.0, axis=mesh.axis_names[0])
    es, samples = q.run_sampling(1.0, timesteps)
    assert np.isfinite(es).all()
    return es
