"""Drop-in `py_monte_carlo` module-name compatibility (lib.rs:14-22 parity)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_py_monte_carlo_module_names():
    import py_monte_carlo

    for name in ("Lattice", "ClassicIsing", "QmcIsing", "QmcRunner", "LatticeTempering"):
        assert hasattr(py_monte_carlo, name), name


def test_readme_usage_example():
    # the reference README's first example (README.md:48-56) runs verbatim
    import py_monte_carlo

    edges = [((0, 1), 1.0), ((1, 2), -1.0)]
    lat = py_monte_carlo.Lattice(edges)
    es, ss = lat.run_monte_carlo(1.0, 10, 4)
    assert es.shape == (4,) and ss.shape == (4, 3)


def test_profiling_meter():
    from pyisingmontecarlo_tpu.utils.profiling import SweepMeter

    with SweepMeter() as m:
        m.add(sweeps=10, sites=1000)
    assert m.sweeps_per_s > 0
    assert "sweeps" in m.report()
