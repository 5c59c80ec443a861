"""Native (C++) host-side components, built on demand with g++.

The reference keeps its host plumbing in C++ (comm_system_backend.cpp) and
its hot decode loops in Fortran (comm_huffman_mod.f90); here the hot host
paths live in a small shared library loaded via ctypes. Compute-path code
stays in JAX/XLA — this library is strictly host-side I/O machinery.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_SRC_DIR, "libcmdr_native.so")
_SOURCES = ["huffman.cpp"]


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    with _LOCK:
        srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
        if (not force and os.path.exists(_SO_PATH)
                and all(os.path.getmtime(_SO_PATH) >= os.path.getmtime(s)
                        for s in srcs)):
            return _SO_PATH
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", _SO_PATH] + srcs
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _SO_PATH


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _LIB
    if _LIB is None:
        path = build()
        L = ctypes.CDLL(path)
        i64p = ctypes.POINTER(ctypes.c_longlong)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        L.huffman_decode.restype = ctypes.c_longlong
        L.huffman_decode.argtypes = [i64p, i64p, ctypes.c_longlong,
                                     ctypes.c_longlong, i64p, u8p,
                                     ctypes.c_longlong, i64p,
                                     ctypes.c_longlong]
        L.cumsum_i64.restype = None
        L.cumsum_i64.argtypes = [i64p, ctypes.c_longlong]
        _LIB = L
    return _LIB
