"""Richardson extrapolation of the Trotter bias (docs/DESIGN.md §8 recipe).

The worldline engines carry an O(dtau^2) discretization bias that the
reference's SSE does not (/root/reference/src/qmcising.rs:37-143 is
Trotter-free by construction). Two runs at dtau and dtau/2 cancel the
leading term:

    E_extrap = (4 * E(dtau/2) - E(dtau)) / 3

This script demonstrates the recipe on a 4-site TFIM ring where the exact
energy is computable by dense diagonalization, printing the bias of each raw
run and of the extrapolated combination (with properly propagated error
bars: se = sqrt(16*se_half^2 + se_full^2) / 3).

    python examples/trotter_extrapolation.py [dtau]
"""

import sys

import numpy as np

from pyisingmontecarlo_tpu import QmcIsing, models


def exact_energy(n, gamma, beta):
    """Dense-diagonalization <E> of the TFIM ring (J = -1)."""
    dim = 2**n
    H = np.zeros((dim, dim))
    for i in range(n):
        jn = (i + 1) % n
        for a in range(dim):
            za = 1.0 if (a >> i) & 1 else -1.0
            zb = 1.0 if (a >> jn) & 1 else -1.0
            H[a, a] += -1.0 * za * zb
            H[a ^ (1 << i), a] += -gamma
    w, _ = np.linalg.eigh(H)
    p = np.exp(-beta * (w - w.min()))
    return float((w * p).sum() / p.sum())


def run(n, gamma, beta, dtau, timesteps=600, replicas=256, seed=7):
    q = QmcIsing(
        models.chain_edges(n, j=-1.0), gamma,
        num_experiments=replicas, seed=seed, dtau=dtau,
    )
    q.run_qmc(beta, 150)  # equilibrate
    es, _ = q.run_sampling(beta, timesteps, sampling_wait_buffer=0)
    return float(es.mean()), float(es.std(ddof=1) / np.sqrt(len(es)))


def main():
    n, gamma, beta = 4, 1.0, 2.0
    dtau = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    ex = exact_energy(n, gamma, beta)
    print(f"# TFIM ring n={n} Gamma={gamma} beta={beta}: exact <E> = {ex:.5f}")

    e_full, se_full = run(n, gamma, beta, dtau)
    e_half, se_half = run(n, gamma, beta, dtau / 2, seed=8)
    e_x = (4.0 * e_half - e_full) / 3.0
    se_x = np.sqrt(16.0 * se_half**2 + se_full**2) / 3.0

    print(f"# {'run':>14} {'<E>':>9} {'stderr':>8} {'bias':>9}")
    print(f"  {'dtau=' + format(dtau, '.3f'):>14} {e_full:9.5f} {se_full:8.5f} {e_full - ex:9.5f}")
    print(f"  {'dtau=' + format(dtau / 2, '.3f'):>14} {e_half:9.5f} {se_half:8.5f} {e_half - ex:9.5f}")
    print(f"  {'Richardson':>14} {e_x:9.5f} {se_x:8.5f} {e_x - ex:9.5f}")
    print("# the combination cancels the leading O(dtau^2) term: its bias")
    print("# should sit inside its error bar while the coarse run's does not")


if __name__ == "__main__":
    main()
