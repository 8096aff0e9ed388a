"""ctypes bindings for the native ring-arithmetic library (native/ring.cpp).

The host SS engine's hot paths (elementwise 256/128-bit modular add / sub /
mul, signed-digit reduction, weighted dot, matmul) run as C++ 64-bit-limb
kernels with the GIL released; Python keeps the canonical base-2^8 digit
arrays of ops/ring.py at every boundary, so PRG streams, the wire format and
protocol semantics are unchanged.  This is the framework's native equivalent
of the reference's hand-optimized Go big-int loops (hhcho/mpc-core RElem,
used throughout mpc/mpc.go).

Disable with SFGWAS_NO_NATIVE_RING=1 (tests compare against the numpy
oracle path)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

# (modulus, kind) -> ring id in native/ring.cpp
_RING_IDS = {
    ((1 << 256) - 189, "prime"): 0,
    ((1 << 127) - 1, "prime"): 1,
    (1 << 256, "pow2"): 2,
    (1 << 127, "pow2"): 3,
}


def ring_id(modulus: int, kind: str):
    return _RING_IDS.get((modulus, kind))


def lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SFGWAS_NO_NATIVE_RING"):
        return None
    try:
        here = os.path.join(os.path.dirname(__file__), "..", "native")
        so = os.path.join(here, "libsfgring.so")
        src = os.path.join(here, "ring.cpp")
        if not os.path.exists(so) or os.path.getmtime(src) > os.path.getmtime(so):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-o", so, src],
                check=True,
                capture_output=True,
            )
        L = ctypes.CDLL(so)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        for name in ("sfg_ring_add", "sfg_ring_sub", "sfg_ring_mul"):
            fn = getattr(L, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_int, i32p, i32p, ctypes.c_int64, i32p]
        L.sfg_ring_neg.restype = None
        L.sfg_ring_neg.argtypes = [ctypes.c_int, i32p, ctypes.c_int64, i32p]
        L.sfg_ring_reduce64.restype = None
        L.sfg_ring_reduce64.argtypes = [
            ctypes.c_int, i64p, ctypes.c_int64, ctypes.c_int, i32p,
        ]
        L.sfg_ring_dot.restype = None
        L.sfg_ring_dot.argtypes = [
            ctypes.c_int, i32p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        L.sfg_ring_matmul.restype = None
        L.sfg_ring_matmul.argtypes = [
            ctypes.c_int, i32p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        _LIB = L
    except Exception:
        _LIB = None
    return _LIB
