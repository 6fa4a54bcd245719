"""Imaginary-time sharding: one TFIM worldline split across devices.

At large beta * Gamma the worldline tensor [replicas, nvars, L_tau] outgrows a
single chip; its tau axis then shards over a device mesh like any spatial axis
(SURVEY.md §5 "long-context analogue"). Each device owns a tau-slab, exchanges
one boundary slice per direction with ring neighbors (lax.ppermute), and runs
the dense update composition locally; FK clusters build on the open local
window with shard-parity alternation (see pyisingmontecarlo_tpu/parallel/tau.py
for the detailed-balance argument).

Runs anywhere: on a virtual CPU mesh here (8 devices), on real chips by just
building the mesh from jax.devices() — and on a pod after
``pyisingmontecarlo_tpu.parallel.mesh.init_distributed()``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pyisingmontecarlo_tpu.engines import classical as ce
from pyisingmontecarlo_tpu.engines import worldline as wl
from pyisingmontecarlo_tpu.graph import compile_graph
from pyisingmontecarlo_tpu.parallel import mesh as pmesh
from pyisingmontecarlo_tpu.parallel import tau as pt


def main():
    nvars, ltau, replicas = 16, 64, 128
    beta, gamma = 2.0, 1.0
    edges = [((i, (i + 1) % nvars), -1.0) for i in range(nvars)]

    mesh = pmesh.make_mesh((8,), ("tau",))  # 8 tau-slabs of 8 slices each
    key = jax.random.key(0)
    s = jax.random.bernoulli(key, 0.5, (replicas, nvars, ltau)).astype(jnp.int8) * 2 - 1

    cg = compile_graph(edges)
    ga = ce.device_graph(cg)
    p = wl.make_params(np.full(replicas, beta), gamma, 0.0, ltau)

    for step in range(6):
        s = pt.sharded_wl_sweeps(
            s, jax.random.key(step + 1), mesh, beta, gamma, -1.0, 0.0, sweeps=20
        )
        e = np.asarray(wl.total_energy(ga, p, jnp.asarray(np.asarray(s))))
        print(
            f"after {20 * (step + 1):3d} sweeps: <E> = {e.mean():8.4f} "
            f"+- {e.std(ddof=1) / np.sqrt(replicas):.4f}"
        )
    print(f"state sharding: {s.sharding}")


if __name__ == "__main__":
    main()
