"""Per-family wall-time profile of the gm-engine sweep on the current backend.

Times each update family of ``generic_gm.sweep_gm`` (site/segment/kink/line/
slice/free/energy) as its own jitted call at the hard-terms bench shape, so
optimization effort lands where the sweep time actually goes. Shapes follow
benches/bench_qmcrunner_hard.py (override with PMC_BENCH_N / PMC_BENCH_R).
"""

import os
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pmc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import numpy as np

    from bench_qmcrunner_hard import build

    n = int(os.environ.get("PMC_BENCH_N", "32"))
    R = int(os.environ.get("PMC_BENCH_R", "64"))
    iters = int(os.environ.get("PMC_PROF_ITERS", "200"))
    q = build(n, R, gamma=1.0, jx=0.5, k3=0.25)
    w = q._ensure(1.0)
    assert w.use_gm, "profile needs the gm path (PMC_GENERIC_GM=1 to force)"
    import pyisingmontecarlo_tpu.engines.generic_gm as gg
    from pyisingmontecarlo_tpu.engines.generic import (
        N_SEGMENT_PASSES,
        N_TERMKINK_PASSES,
    )

    comp = w.comp
    gs = gg.compile_gm(comp, n)
    kinks = gg.compile_gm_kinks(comp, gs) if comp.tkink else ()
    h = gs.host
    print(
        f"G={h.G} n={h.n} ncolors={len(h.color_rows)} TT={gs.W.shape[1]} "
        f"npairs={len(h.pairs)} seg={N_SEGMENT_PASSES} kink={N_TERMKINK_PASSES} "
        f"phases={len(kinks)} Tc={[c.Tc for c in gs.csub]} do_loop={w.do_loop}",
        flush=True,
    )
    s = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, (R, h.n, w.Lt)).astype(np.int8)
        * 2
        - 1
    )
    gm = gg.to_gm(s, h.G)
    keys = jax.random.split(jax.random.key(0), R)

    def timeit(name, fn):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        o = f(gm, keys)
        jax.block_until_ready(o)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(gm, keys)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:24s} {dt * 1e6:9.1f} us   (compile+first {tc:6.1f} s)", flush=True)
        return dt

    tot = 0.0

    def sites(gm, keys):
        for c in range(len(h.color_rows)):
            for p in (0, 1):
                keys, sub = gg.split_keys(keys)
                gm = gg.site_update_gm(gs, gm, sub, c, p, R)
        return gm

    tot += timeit(f"site x{2 * len(h.color_rows)}", sites)

    def segs(gm, keys):
        for _ in range(N_SEGMENT_PASSES):
            keys, sub = gg.split_keys(keys)
            gm, _ = gg.segment_update_gm(gs, gm, sub, R)
        return gm

    tot += timeit(f"segment x{N_SEGMENT_PASSES}", segs)
    if kinks:

        def kk(gm, keys):
            for _ in range(N_TERMKINK_PASSES):
                keys, sub = gg.split_keys(keys)
                gm, _ = gg.term_kink_update_gm(gs, kinks, gm, sub, R)
            return gm

        tot += timeit(f"kink x{N_TERMKINK_PASSES}", kk)

    def lines(gm, keys):
        for c in range(len(h.color_rows)):
            keys, sub = gg.split_keys(keys)
            gm = gg.line_update_gm(gs, gm, sub, c, R)
        return gm

    tot += timeit("line xcolors", lines)
    if w.do_loop:

        def slcs(gm, keys):
            for c in range(len(h.color_rows)):
                keys, sub = gg.split_keys(keys)
                gm = gg.slice_update_gm(gs, gm, sub, c, R)
            return gm

        tot += timeit("slice xcolors", slcs)

    def frees(gm, keys):
        keys, sub = gg.split_keys(keys)
        return gg.free_var_update_gm(gs, gm, sub, comp.free_vars, R)

    tot += timeit("free", frees)
    tot += timeit("energy", lambda gm, keys: gg.energy_gm(gs, gm, R, w.Lt, 0.0))
    print(f"sum of parts: {tot * 1e6:.1f} us/sweep", flush=True)


if __name__ == "__main__":
    main()
