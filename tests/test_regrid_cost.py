"""Quantify the beta-regrid re-equilibration cost (VERDICT round-3 weak 6).

The reference's SSE reuses its operator string verbatim across any beta change
(/root/reference/src/qmcrunner.rs:161-201 just passes the new beta into
timesteps), so a beta sweep pays zero re-equilibration. This framework's
tau-grid length tracks beta, so a beta change nearest-slice-resamples the
worldline (qmcising.py beta regrid; engines/generic.regrid_worldline) — a
valid configuration of the new ensemble, but not an equilibrium draw.

These tests pin the SIZE of that cost on an exactly-solvable system: the
immediate post-regrid energy bias must be a small fraction of the cold-start
(classical product state) bias, and must decay to statistical agreement with
the exact value within a fixed, small sweep budget. Together they give a
beta-sweep user a concrete re-equilibration recipe (the numbers quoted in
docs/DESIGN.md §8): a handful of discard sweeps per beta step, not a fresh
equilibration.
"""

import numpy as np

from helpers import dense_tfim_energy
from pyisingmontecarlo_tpu import QmcIsing

EDGES = [((i, (i + 1) % 4), -1.0) for i in range(4)]
R = 256


def _mean_first_sweeps(q, beta, nsweeps):
    """Per-sweep mean energy over the FIRST nsweeps at beta (no wait)."""
    es, _ = q.run_sampling(beta, nsweeps, sampling_wait_buffer=0)
    return float(np.mean(es))


def test_regrid_start_far_closer_than_cold_start():
    beta0, beta1 = 1.0, 1.8
    ex = dense_tfim_energy(EDGES, 0.0, 1.0, beta1, 4)

    # warm path: equilibrate at beta0, then regrid to beta1 and measure the
    # first sweeps immediately (the re-equilibration transient, if any)
    qw = QmcIsing(EDGES, 1.0, num_experiments=R, seed=21)
    qw.run_qmc(beta0, 120)
    warm = _mean_first_sweeps(qw, beta1, 8)

    # cold path: fresh object, measure the same first sweeps from the
    # classical product start
    qc = QmcIsing(EDGES, 1.0, num_experiments=R, seed=22)
    cold = _mean_first_sweeps(qc, beta1, 8)

    warm_bias = abs(warm - ex)
    cold_bias = abs(cold - ex)
    # the cold start has a large O(1) transient; the regridded start must
    # retain most of the beta0 equilibrium's information
    assert cold_bias > 0.05, (cold, ex)  # the probe itself must be sensitive
    assert warm_bias < 0.5 * cold_bias, (warm, cold, ex)


def test_regrid_requilibrates_within_fixed_budget():
    """After a beta step of the size an annealing-in-beta workload takes,
    a FIXED small discard budget restores statistical agreement with exact."""
    beta0, beta1 = 1.0, 1.4
    ex = dense_tfim_energy(EDGES, 0.0, 1.0, beta1, 4)

    q = QmcIsing(EDGES, 1.0, num_experiments=R, seed=23)
    q.run_qmc(beta0, 120)
    # 10 discard sweeps at the new beta, then measure
    q.run_qmc(beta1, 10)
    es, _ = q.run_sampling(beta1, 150, sampling_wait_buffer=0)
    se = es.std(ddof=1) / np.sqrt(len(es))
    assert abs(es.mean() - ex) < 4 * se + 0.04, (es.mean(), ex, se)
