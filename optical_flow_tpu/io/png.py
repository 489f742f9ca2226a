"""PNG decoding for the data path.

The reference decodes frames through PIL (``io/flo_io.py:84-96``).  Here the
hot serving path uses a native C decoder (``native/pngdec.c``: one buffered
read, streaming zlib inflate, scanline unfilter, straight into a numpy
buffer) so background loader threads (``io/loader.py``) decode without any
Python-level per-chunk work; PIL remains the portable fallback and handles
the formats the C subset rejects (16-bit, interlaced, ...).
"""
from __future__ import annotations

import ctypes

import numpy as np


def _native():
    try:
        from optical_flow_tpu.native.build import load_pngdec

        return load_pngdec()
    except Exception:
        return None


def read_png(path) -> np.ndarray:
    """Decode a PNG into a uint8 array: (H, W) for grayscale, else (H, W, C).

    Matches ``np.array(PIL.Image.open(path))`` exactly for 8-bit
    non-interlaced gray/RGB/palette/alpha files (palette expands to RGB, as
    PIL's default mode conversion does for dataset images); falls back to
    PIL for anything else.
    """
    lib = _native()
    path = str(path)
    if lib is not None:
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        ch = ctypes.c_int32()
        null_u8 = ctypes.POINTER(ctypes.c_uint8)()
        rc = lib.png_decode_file(
            path.encode(), null_u8, 0, ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch)
        )
        if rc == -1:
            raise FileNotFoundError(path)
        if rc == 0:
            out = np.empty((h.value, w.value, ch.value), dtype=np.uint8)
            rc = lib.png_decode_file(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.size,
                ctypes.byref(w),
                ctypes.byref(h),
                ctypes.byref(ch),
            )
            if rc == 0:
                return out[:, :, 0] if ch.value == 1 else out
        # unsupported subset or unexpected rc: fall through to PIL

    from PIL import Image

    with Image.open(path) as im:
        if im.mode == "P":
            im = im.convert("RGB")
        return np.array(im)
