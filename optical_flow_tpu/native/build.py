"""Lazy ctypes build/load of the native helpers."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load_floio() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libfloio; None if no toolchain is available."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_DIR, "floio.c")
        lib_path = os.path.join(_DIR, "libfloio.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", lib_path, src],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
            lib.flo_read.restype = ctypes.c_int
            lib.flo_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.flo_write.restype = ctypes.c_int
            lib.flo_write.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
