"""Middlebury ``.flo`` optical flow I/O.

Format (reference ``io/flo_io.py:1-11``): float32 magic 202021.25, int32
width/height, then row-major interleaved (u, v) float32 pairs.  Host-side
numpy — I/O never touches the device.
"""
from __future__ import annotations

import os

import numpy as np

TAG_FLOAT = 202021.25


def _native():
    try:
        from optical_flow_tpu.native.build import load_floio

        return load_floio()
    except Exception:
        return None


def read_flo(filename):
    """Read a ``.flo`` file into an (H, W, 2) float32 array.

    Uses the native C reader (optical_flow_tpu/native/floio.c) when a
    toolchain is available; pure-numpy otherwise.
    """
    lib = _native()
    if lib is not None:
        import ctypes

        w = ctypes.c_int32()
        h = ctypes.c_int32()
        path = str(filename).encode()
        null_f = ctypes.POINTER(ctypes.c_float)()
        rc = lib.flo_read(path, ctypes.byref(w), ctypes.byref(h), null_f, 0)
        if rc == -1:
            raise FileNotFoundError(filename)
        if rc == -2:
            raise ValueError(f"Invalid .flo file tag (expected {TAG_FLOAT})")
        if rc == 0:
            out = np.empty((h.value, w.value, 2), dtype=np.float32)
            rc = lib.flo_read(
                path,
                ctypes.byref(w),
                ctypes.byref(h),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.size,
            )
            if rc == 0:
                return out
        # fall through to numpy on any unexpected rc

    with open(filename, "rb") as f:
        tag = np.fromfile(f, np.float32, count=1)[0]
        if tag != np.float32(TAG_FLOAT):
            raise ValueError(f"Invalid .flo file tag: {tag} (expected {TAG_FLOAT})")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32)
    return data.reshape((h, w, 2))


def write_flo(flow, filename):
    """Write an (H, W, 2) flow field as ``.flo``."""
    flow = np.ascontiguousarray(np.asarray(flow, dtype=np.float32))
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"Flow must be (H, W, 2) array, got shape {flow.shape}")
    h, w = flow.shape[:2]
    lib = _native()
    if lib is not None:
        import ctypes

        rc = lib.flo_write(
            str(filename).encode(),
            w,
            h,
            flow.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return
    with open(filename, "wb") as f:
        np.array([TAG_FLOAT], dtype=np.float32).tofile(f)
        np.array([w, h], dtype=np.int32).tofile(f)
        flow.tofile(f)


def read_flow_file(seq_name, i_seq, data_dir=None):
    """Load a Middlebury image pair + ground-truth flow.

    Layout (reference ``flo_io.py:66-113``):
        data_dir/other-data/{seq}/frame{i:02d}.png
        data_dir/other-gt-flow/{seq}/flow{i:02d}.flo

    ``data_dir`` defaults to $OPTICAL_FLOW_DATA_DIR, falling back to the
    reference checkout's data directory when present.
    """
    from optical_flow_tpu.io.png import read_png

    if data_dir is None:
        data_dir = os.environ.get("OPTICAL_FLOW_DATA_DIR")
    if data_dir is None:
        for candidate in (
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"),
            "/root/reference/data",
        ):
            if os.path.isdir(candidate):
                data_dir = candidate
                break
    if data_dir is None:
        raise FileNotFoundError(
            "No Middlebury data directory found; set OPTICAL_FLOW_DATA_DIR."
        )

    img_dir = os.path.join(data_dir, "other-data", seq_name)
    im1 = read_png(os.path.join(img_dir, f"frame{i_seq:02d}.png")).astype(np.float64)
    im2 = read_png(os.path.join(img_dir, f"frame{i_seq + 1:02d}.png")).astype(np.float64)

    gt_path = os.path.join(data_dir, "other-gt-flow", seq_name, f"flow{i_seq:02d}.flo")
    if os.path.exists(gt_path):
        gt = read_flo(gt_path)
        tu, tv = gt[:, :, 0], gt[:, :, 1]
    else:
        tu = tv = None
    return im1, im2, tu, tv
