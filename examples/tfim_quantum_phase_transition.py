"""Transverse-field Ising chain across its quantum critical point Gamma/J = 1:
magnetization-squared vs Gamma at low temperature via worldline QMC.

    python examples/tfim_quantum_phase_transition.py [n_sites]
"""

import sys

import numpy as np

from pyisingmontecarlo_tpu import Lattice, models


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    beta = 8.0  # low temperature: probes the ground state
    print(f"# TFIM chain n={n}, beta={beta}: <m_z^2> collapses past Gamma/J = 1")
    print(f"# {'Gamma':>6} {'<m^2>':>8} {'<E>/n':>8}")
    for gamma in (0.4, 0.7, 1.0, 1.3, 1.8):
        lat = Lattice(models.chain_edges(n, j=-1.0), seed_gen=1)
        lat.set_transverse_field(gamma)
        meas, es = lat.run_quantum_monte_carlo_and_measure_spins(
            beta, 400, 32, sampling_wait_buffer=300, exponent=2
        )
        print(f"  {gamma:6.2f} {meas.mean()/n**2:8.4f} {es.mean()/n:8.4f}")


if __name__ == "__main__":
    main()
