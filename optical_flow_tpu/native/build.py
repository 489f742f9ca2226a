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
_PNG_LIB: Optional[ctypes.CDLL] = None
_PNG_TRIED = False


def _build(name: str, extra_flags=()) -> ctypes.CDLL:
    """Compile (if stale) and dlopen a one-file native helper."""
    src = os.path.join(_DIR, f"{name}.c")
    lib_path = os.path.join(_DIR, f"lib{name}.so")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", lib_path, src, *extra_flags],
            check=True,
            capture_output=True,
        )
    return ctypes.CDLL(lib_path)


def load_pngdec() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libpngdec; None when no toolchain/zlib."""
    global _PNG_LIB, _PNG_TRIED
    with _LOCK:
        if _PNG_LIB is not None or _PNG_TRIED:
            return _PNG_LIB
        _PNG_TRIED = True
        try:
            lib = _build("pngdec", ("-lz",))
            lib.png_decode_file.restype = ctypes.c_int
            lib.png_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _PNG_LIB = lib
        except Exception:
            _PNG_LIB = None
        return _PNG_LIB


def load_floio() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libfloio; None if no toolchain is available."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = _build("floio")
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
