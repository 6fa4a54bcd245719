"""Generic k-local (QmcRunner) worldline throughput — HARD term classes.

Prints one JSON line: site-sub-slice updates/sec for a 32-site chain with
**off-diagonal 2-local** (XX bonds) and **3-local** (ZZZ triples) terms on top
of the TFIM base (ZZ bonds + X fields), 64 replicas, through the public
QmcRunner API. These are exactly the arity classes the round-2 fast paths did
not cover (they paid 3-index table gathers; VERDICT round-2 next item 1).
Reference surface: qmcrunner.rs:94-135 (arbitrary 2^k x 2^k interactions) +
:161-201 (sampling).
"""

import json
import time

import numpy as np


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def zz_diag(j):
    out = np.zeros(4)
    for idx in range(4):
        z0 = 1.0 if idx & 1 else -1.0
        z1 = 1.0 if idx & 2 else -1.0
        out[idx] = j * z0 * z1
    return out


def xx_mat(jx):
    """-jx * X x X as a flattened 4x4 (stoquastic for jx > 0)."""
    m = np.zeros((4, 4))
    for a in range(4):
        m[a, a ^ 3] = -jx
    return m.reshape(-1)


def zzz_diag(k3):
    out = np.zeros(8)
    for idx in range(8):
        z = [1.0 if idx & (1 << b) else -1.0 for b in range(3)]
        out[idx] = k3 * z[0] * z[1] * z[2]
    return out


def build(n, replicas, gamma, jx, k3, seed=0):
    from pyisingmontecarlo_tpu import QmcRunner

    q = QmcRunner(n, replicas, seed=seed)
    for i in range(n):
        q.add_diagonal_interaction(zz_diag(-1.0), [i, (i + 1) % n])
        q.add_interaction(np.array([0.0, -gamma, -gamma, 0.0]), [i])
        q.add_interaction(xx_mat(jx), [i, (i + 1) % n])
        q.add_diagonal_interaction(zzz_diag(k3), [i, (i + 1) % n, (i + 2) % n])
    return q


def main():
    import os

    _enable_cache()
    smoke = bool(os.environ.get("PMC_BENCH_SMOKE"))
    n = int(os.environ.get("PMC_BENCH_N", "8" if smoke else "32"))
    replicas = int(os.environ.get("PMC_BENCH_R", "4" if smoke else "64"))
    beta = 1.0
    q = build(n, replicas, gamma=1.0, jx=0.5, k3=0.25)

    # slope timing between two sweep counts: the axon tunnel adds a
    # ~30-90 ms fixed floor per dispatch which a single-run/T division
    # would misattribute to the sweeps
    t_lo, t_hi = (4, 8) if smoke else (200, 800)
    q.run_sampling(beta, t_lo)  # compile + warm (+ builds the grid)
    q.run_sampling(beta, t_hi)
    w = q._w
    ts = {t_lo: [], t_hi: []}
    for t in (t_lo, t_hi, t_lo, t_hi):
        t0 = time.perf_counter()
        q.run_sampling(beta, t)
        ts[t].append(time.perf_counter() - t0)
    dt = min(ts[t_hi]) - min(ts[t_lo])
    sweeps = t_hi - t_lo
    updates = replicas * n * w.Lt * sweeps
    print(
        json.dumps(
            {
                "metric": "generic_worldline_site_updates_per_sec_hardterms",
                "value": round(updates / dt, 1),
                "unit": "site-subslice-updates/s",
                "Lt": w.Lt,
                "G": w.comp.G,
                "sweeps_per_sec": round(sweeps / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
