"""TPU-native Ising Monte Carlo framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
Renmusxd/PyIsingMonteCarlo (reference at /root/reference; structural analysis
in SURVEY.md). The five public classes mirror the reference's extension module
``py_monte_carlo`` (/root/reference/src/lib.rs:14-22):

- :class:`Lattice` — stateless classical + quantum MC launcher
- :class:`ClassicIsing` — stateful classical ensemble
- :class:`QmcIsing` — stateful transverse-field Ising QMC ensemble
- :class:`QmcRunner` — generic k-local-interaction QMC ensemble
- :class:`LatticeTempering` — parallel tempering with checkpointing
"""

from .lattice import Lattice

__version__ = "0.1.0"

__all__ = ["Lattice", "ClassicIsing", "QmcIsing", "QmcRunner", "LatticeTempering"]


def __getattr__(name):
    # lazy imports keep `import pyisingmontecarlo_tpu` light and let partially
    # built stages load independently
    if name == "ClassicIsing":
        from .classicising import ClassicIsing

        return ClassicIsing
    if name == "QmcIsing":
        from .qmcising import QmcIsing

        return QmcIsing
    if name == "QmcRunner":
        from .qmcrunner import QmcRunner

        return QmcRunner
    if name == "LatticeTempering":
        from .tempering import LatticeTempering

        return LatticeTempering
    raise AttributeError(name)
