"""Magnetization curve of the 2D Ising ferromagnet across the transition,
compared against Onsager's exact result. Runs the fused torus kernel on TPU.

    python examples/ferromagnet_phase_diagram.py [L]
"""

import sys

import numpy as np

from pyisingmontecarlo_tpu import Lattice, models

BETA_C = 0.44068679350977147


def onsager_m(beta):
    if beta <= BETA_C:
        return 0.0
    return (1.0 - np.sinh(2.0 * beta) ** -4) ** 0.125


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    lat = Lattice(models.square_edges(L, j=-1.0), seed_gen=0)
    print(f"# 2D Ising ferromagnet {L}x{L}: <|m|> vs Onsager")
    print(f"# {'beta':>6} {'<|m|>':>8} {'stderr':>8} {'onsager':>8}")
    for beta in (0.30, 0.38, 0.42, 0.44, 0.46, 0.50, 0.60):
        es, ss = lat.run_monte_carlo_sampling(
            beta, 200, 32, thermalization_time=2000, sampling_freq=20
        )
        m = np.abs(np.where(ss, 1.0, -1.0).mean(axis=2))
        print(f"  {beta:6.2f} {m.mean():8.4f} {m.std(ddof=1)/np.sqrt(m.size):8.4f} "
              f"{onsager_m(beta):8.4f}")


if __name__ == "__main__":
    main()
