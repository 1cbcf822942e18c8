"""Native host-runtime library: C++ accelerator builders behind a C ABI.

Builds lazily with g++ on first use (no pip deps; no pybind11 — plain
ctypes). Falls back cleanly if no compiler is available: callers check
``available()`` and use the NumPy builders instead.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "src", "accel_build.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_accel_build.so")


def _build() -> str | None:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _OUT + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_OUT + ".tmp", _OUT)
        return _OUT
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        c_int = ctypes.c_int
        c_float = ctypes.c_float
        fp = ctypes.POINTER(c_float)
        ip = ctypes.POINTER(c_int)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rt_build_bvh.restype = c_int
        lib.rt_build_bvh.argtypes = [fp, fp, c_int, c_int, ip, fp, fp, u8p,
                                     ip, ip]
        lib.rt_build_grid.restype = c_int
        lib.rt_build_grid.argtypes = [fp, fp, c_int, c_float, fp, fp, ip,
                                      c_int, ip, ip]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None
