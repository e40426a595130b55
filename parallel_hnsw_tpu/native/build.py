"""Compile-on-first-use loader for the native vecio library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vecio.cpp")
_SO = os.path.join(_DIR, "libvecio.so")
_LOCK = threading.Lock()
_LIB = None


def _compile() -> None:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        _SO,
        _SRC,
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_vecio() -> ctypes.CDLL:
    """Load (building if needed) the native IO library and bind signatures."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _compile()
        lib = ctypes.CDLL(_SO)
        lib.vecio_open.restype = ctypes.c_void_p
        lib.vecio_open.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.vecio_count.restype = ctypes.c_int64
        lib.vecio_count.argtypes = [ctypes.c_void_p]
        lib.vecio_dim.restype = ctypes.c_int32
        lib.vecio_dim.argtypes = [ctypes.c_void_p]
        lib.vecio_close.argtypes = [ctypes.c_void_p]
        lib.vecio_read_f32.restype = ctypes.c_int
        lib.vecio_read_f32.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.vecio_read_i32.restype = ctypes.c_int
        lib.vecio_read_i32.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.vecio_write_raw_f32.restype = ctypes.c_int
        lib.vecio_write_raw_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        _LIB = lib
        return lib
