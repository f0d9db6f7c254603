"""Build + load the native host-numerics library (ctypes, no pybind11).

Compiled lazily on first use; all users fall back to the numpy
implementations in :mod:`clima_tpu.ops.rebin` when a compiler is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "futils.cpp")
_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libclimafutils.so")


def _compile():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _OUT]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Return the ctypes library, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_OUT)) or (
                os.path.getmtime(_OUT) < os.path.getmtime(_SRC)
            ):
                _compile()
            lib = ctypes.CDLL(_OUT)
        except Exception:
            return None

        from ctypes import c_int64, POINTER, c_double, c_int

        dp = POINTER(c_double)
        lib.clima_rebin.argtypes = [c_int64, dp, dp, c_int64, dp, dp]
        lib.clima_rebin.restype = c_int
        lib.clima_rebin_with_errors.argtypes = [c_int64, dp, dp, dp, c_int64, dp, dp, dp]
        lib.clima_rebin_with_errors.restype = c_int
        lib.clima_inter2.argtypes = [c_int64, dp, dp, c_int64, dp, dp]
        lib.clima_inter2.restype = c_int
        lib.clima_rebin_rows.argtypes = [c_int64, c_int64, dp, dp, c_int64, dp, dp]
        lib.clima_rebin_rows.restype = c_int
        _LIB = lib
        return _LIB
