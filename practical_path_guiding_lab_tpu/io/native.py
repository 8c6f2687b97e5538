"""ctypes loader for the native IO helpers (C++), built on demand.

The native layer plays the role Mitsuba's C++ core plays for the reference:
hot host-side codecs and builders. Python fallbacks exist for everything.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "cpp" / "piz_native.cpp"
_LIB = _HERE / "cpp" / "_piz_native.so"
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.piz_decompress.restype = ctypes.c_int
            lib.piz_decompress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16),
            ]
            _lib = lib
        except Exception:
            _failed = True
            _lib = None
    return _lib


def piz_decompress(chunk: bytes, width: int, n_lines: int, n_channels: int):
    """Native PIZ chunk decode -> (n_channels, n_lines, width) uint16,
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(n_channels * n_lines * width, dtype=np.uint16)
    rc = lib.piz_decompress(
        chunk,
        len(chunk),
        width,
        n_lines,
        n_channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if rc != 0:
        raise ValueError(f"native PIZ decode failed (rc={rc})")
    return out.reshape(n_channels, n_lines, width)
