"""Drop-in compatibility shim for the reference's extension module name.

The reference installs as ``import py_monte_carlo``
(/root/reference/src/lib.rs:14-22). Scripts written against it can switch to
the TPU framework by replacing the wheel with this package — same module name,
same five classes.
"""

from pyisingmontecarlo_tpu import (  # noqa: F401
    ClassicIsing,
    Lattice,
    LatticeTempering,
    QmcIsing,
    QmcRunner,
)

__all__ = ["Lattice", "ClassicIsing", "QmcIsing", "QmcRunner", "LatticeTempering"]
