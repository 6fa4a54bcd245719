"""gm/classic crossover pricing for the generic k-local engine.

``GenericWorldline`` auto-gates between the group-major matmul engine
(engines/generic_gm.py) and the classic select-chain path (engines/generic.py)
on the table footprint G*n*TT <= PMC_GM_MAX (generic_gm.gm_eligible). The
round-4 capture measured a 24x gap between the two paths at one shape but
never priced the boundary itself (VERDICT round-4 item 3 / weak 6): a user
whose system crosses the cap silently lands on the slow path.

This bench measures BOTH engines at TWO matched shapes straddling the default
cap on the hard term mix (TFIM + XX + ZZZ ring): just below (auto -> gm) and
just above (auto -> classic), plus the forced-opposite engine at each size, so
BASELINE.md can state what the cap costs and what moving it (env PMC_GM_MAX)
buys. Prints one JSON line per (n, engine) run.

Reference surface: /root/reference/src/qmcrunner.rs:94-135, :161-201.
"""

import json
import os
import time


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    import numpy as np

    from bench_qmcrunner_hard import build

    _enable_cache()
    smoke = bool(os.environ.get("PMC_BENCH_SMOKE"))
    if smoke:
        n_lo, n_hi, R = 8, 16, 4
        t_lo, t_hi = 2, 4
    else:
        # hard family: TT = 4n terms, G = 10 groups -> footprint 40n^2;
        # the default cap 8M sits between 40*416^2 = 6.9M and 40*480^2 = 9.2M
        n_lo, n_hi, R = 416, 480, 64
        t_lo, t_hi = 50, 200
    beta = 1.0

    results = []
    for n in (n_lo, n_hi):
        for mode in ("auto", "1", "0"):
            os.environ["PMC_GENERIC_GM"] = mode
            if smoke:
                # straddle a synthetic cap so auto-gating is exercised at
                # tiny shapes too (G*n*TT = 40n^2 for this family)
                os.environ["PMC_GM_MAX"] = str(40 * ((n_lo + n_hi) // 2) ** 2)
            q = build(n, R, gamma=1.0, jx=0.5, k3=0.25)
            w = q._ensure(beta)
            path = "gm" if w.use_gm else "classic"
            if mode == "auto":
                expect = "gm" if n == n_lo else "classic"
                assert path == expect, (n, mode, path)
            else:
                assert (mode == "1") == (path == "gm"), (n, mode, path)
            if mode != "auto" and any(
                r["n"] == n and r["path"] == path for r in results
            ):
                continue  # forced run duplicates the auto decision: skip
            q.run_sampling(beta, t_lo)
            q.run_sampling(beta, t_hi)
            ts = {t_lo: [], t_hi: []}
            for t in (t_lo, t_hi, t_lo, t_hi):
                t0 = time.perf_counter()
                q.run_sampling(beta, t)
                ts[t].append(time.perf_counter() - t0)
            dt = min(ts[t_hi]) - min(ts[t_lo])
            sweeps = t_hi - t_lo
            rec = {
                "metric": "gm_crossover_site_updates_per_sec",
                "value": round(R * n * w.Lt * sweeps / dt, 1),
                "unit": "site-subslice-updates/s",
                "n": n,
                "R": R,
                "Lt": w.Lt,
                "path": path,
                "mode": mode,
                "footprint_GnTT": int(w.comp.G * n * w.comp.nterms),
                "sweeps_per_sec": round(sweeps / dt, 2),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    os.environ.pop("PMC_GENERIC_GM", None)


if __name__ == "__main__":
    main()
