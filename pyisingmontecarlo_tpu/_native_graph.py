"""ctypes loader for the native graph-compilation library (native/graphc.cpp).

Builds the shared library on first use (cached next to the package); falls
back cleanly (``available() -> False``) when no compiler is present, in which
case graph.py uses its numpy/python implementations. Tests cross-check both.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_HERE), "native", "graphc.cpp")
_SO = os.path.join(_HERE, "_graphc.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.graphc_degrees.restype = ctypes.c_int32
            lib.graphc_degrees.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p]
            lib.graphc_build_ell.restype = None
            lib.graphc_build_ell.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                i32p, i32p, f64p, i32p, f64p, i32p, i32p,
            ]
            lib.graphc_color_sites.restype = ctypes.c_int32
            lib.graphc_color_sites.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p]
            lib.graphc_color_edges.restype = ctypes.c_int32
            lib.graphc_color_edges.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p]
            lib.graphc_strong_color_edges.restype = ctypes.c_int32
            lib.graphc_strong_color_edges.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def build_ell(nvars: int, ea: np.ndarray, eb: np.ndarray, ej: np.ndarray):
    lib = _load()
    ea = np.ascontiguousarray(ea, np.int32)
    eb = np.ascontiguousarray(eb, np.int32)
    ej = np.ascontiguousarray(ej, np.float64)
    E = len(ea)
    degree = np.zeros(nvars, np.int32)
    max_deg = int(lib.graphc_degrees(nvars, E, ea, eb, degree))
    neighbors = np.zeros((nvars, max_deg), np.int32)
    jmat = np.zeros((nvars, max_deg), np.float64)
    slot_a = np.zeros(E, np.int32)
    slot_b = np.zeros(E, np.int32)
    lib.graphc_build_ell(
        nvars, E, max_deg, ea, eb, ej,
        neighbors.reshape(-1), jmat.reshape(-1), slot_a, slot_b,
    )
    return neighbors, jmat, degree, max_deg, slot_a, slot_b


def color_sites(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    lib = _load()
    ea = np.ascontiguousarray(ea, np.int32)
    eb = np.ascontiguousarray(eb, np.int32)
    colors = np.empty(nvars, np.int32)
    lib.graphc_color_sites(nvars, len(ea), ea, eb, colors)
    return colors


def color_edges(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    lib = _load()
    ea = np.ascontiguousarray(ea, np.int32)
    eb = np.ascontiguousarray(eb, np.int32)
    ecolors = np.empty(len(ea), np.int32)
    lib.graphc_color_edges(nvars, len(ea), ea, eb, ecolors)
    return ecolors


def strong_color_edges(nvars: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    lib = _load()
    if not hasattr(lib, "graphc_strong_color_edges"):
        raise AttributeError("stale native library without strong coloring")
    ea = np.ascontiguousarray(ea, np.int32)
    eb = np.ascontiguousarray(eb, np.int32)
    ecolors = np.empty(len(ea), np.int32)
    lib.graphc_strong_color_edges(nvars, len(ea), ea, eb, ecolors)
    return ecolors
