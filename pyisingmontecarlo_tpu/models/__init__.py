"""Standard model families: edge-list builders for common lattices and
disorder ensembles, matching the workloads the reference is used for
(BASELINE.json configs: square ferromagnet, frustrated triangular AFM,
+-J spin glass, TFIM chains)."""

from .lattices import (
    chain_edges,
    cubic_edges,
    gaussian_spin_glass_edges,
    pm_j_spin_glass_edges,
    square_edges,
    triangular_edges,
)

__all__ = [
    "chain_edges",
    "square_edges",
    "triangular_edges",
    "cubic_edges",
    "pm_j_spin_glass_edges",
    "gaussian_spin_glass_edges",
]
