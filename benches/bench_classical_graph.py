"""TPU bench: arbitrary-graph classical sweeps (engines/classical.py).

The reference's home turf is frustrated arbitrary graphs driven through
``GraphState::do_time_step`` (/root/reference/src/classicising.rs:88-110); on
TPU these run the ELL/gather XLA path, not the fused square-torus kernel.
Measures each move family separately on a random 4-regular +-J spin glass
(n=4096, R=64 — the shape VERDICT round-2 recorded at spin 162 us / edge
682 us / worm 353 us / SW ~40 ms per step).

Prints one JSON line per family.
"""

import json
import os
import time

import numpy as np


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def random_regular_pm_j(n: int, half_deg: int, seed: int):
    """Union of ``half_deg`` random Hamilton cycles -> 2*half_deg-regular
    multigraph-free edge list with +-J couplings."""
    rng = np.random.default_rng(seed)
    seen = set()
    edges = []
    for _ in range(half_deg):
        perm = rng.permutation(n)
        for i in range(n):
            a, b = int(perm[i]), int(perm[(i + 1) % n])
            key = (min(a, b), max(a, b))
            if a != b and key not in seen:
                seen.add(key)
                edges.append(((a, b), 1.0 if rng.random() < 0.5 else -1.0))
    return edges


def main():
    _enable_cache()
    import jax.numpy as jnp

    from pyisingmontecarlo_tpu import rng as prng
    from pyisingmontecarlo_tpu.engines import classical as ce
    from pyisingmontecarlo_tpu.graph import compile_graph

    # two sizes on purpose: n=4096 rides the dense-coupling MXU path, n=16384
    # crosses the _DENSE_MAX=8192 boundary onto the padded-ELL gather path
    # (engines/classical.py; PMC_DENSE_MAX env raises the cliff) — the
    # spin-family number at n=16384 prices that cliff for users
    # (VERDICT round-3 weak 8).
    sizes = [(4096, None), (16384, ("spin",))]
    R = 64
    if os.environ.get("PMC_BENCH_SMOKE"):
        sizes = [(64, None), (128, ("spin",))]
        R = 4
    if os.environ.get("PMC_BENCH_FAMS"):
        # restrict to a family subset at the first size (e.g. the
        # PMC_EDGE_B0 A/B capture stages run FAMS=edge twice in one session)
        fams = tuple(os.environ["PMC_BENCH_FAMS"].split(","))
        sizes = [(sizes[0][0], fams)]
    for n, only_fams in sizes:
        beta = 1.5
        cg = compile_graph(random_regular_pm_j(n, 2, seed=7))
        ga = ce.device_graph_sorted(cg)
        bias = jnp.zeros((n,), jnp.float32)
        keys = prng.keys_from_seeds(prng.MasterRng(3).make_seeds(R))
        s = ce.random_states(keys, n)
        _bench_families(ce, jnp, ga, bias, s, keys, n, R, beta, only_fams)


def _bench_families(ce, jnp, ga, bias, s, keys, n, R, beta, only_fams=None):
    fams = {
        "spin": dict(nspin_sweeps=1, nedge_sweeps=0, nworms=0, nclusters=0),
        "edge": dict(nspin_sweeps=0, nedge_sweeps=1, nworms=0, nclusters=0),
        "worm": dict(nspin_sweeps=0, nedge_sweeps=0, nworms=1, nclusters=0),
        "sw": dict(nspin_sweeps=0, nedge_sweeps=0, nworms=0, nclusters=1),
        "default": dict(nspin_sweeps=1, nedge_sweeps=1, nworms=1, nclusters=0),
    }
    steps = {"spin": 512, "edge": 512, "worm": 512, "sw": 64, "default": 256}
    if os.environ.get("PMC_BENCH_SMOKE"):
        steps = {k: 2 for k in steps}
    for name, kw in fams.items():
        if only_fams is not None and name not in only_fams:
            continue
        # axon: every dispatch carries a ~30-90 ms tunnel floor and
        # block_until_ready does not block. Measure the SLOPE between two
        # dispatch lengths (each forced by a host transfer), best-of-2 per
        # length — floor-immune per-step cost.
        T1 = steps[name]
        T2 = 4 * T1
        args = dict(only_basic=False, heatbath=False, wlen=32, **kw)

        def run(T):
            beta_arr = jnp.full((T,), beta, jnp.float32)
            out = ce.run_steps(ga, bias, s, keys, beta_arr, **args)
            return np.asarray(out[0])

        run(T1), run(T2)  # compile both lengths
        ts = []
        for T in (T1, T2, T1, T2):
            t0 = time.perf_counter()
            run(T)
            ts.append(time.perf_counter() - t0)
        dt = min(ts[1], ts[3]) - min(ts[0], ts[2])
        us = dt / (T2 - T1) * 1e6
        print(
            json.dumps(
                {
                    "metric": f"graph_classical_{name}_step_us",
                    "value": round(us, 1),
                    "unit": "us/step",
                    "nvars": n,
                    "replicas": R,
                    "path": "ell" if ga.A_hi is None else "dense",
                    "site_updates_per_sec": round(n * R * (T2 - T1) / dt, 0),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
