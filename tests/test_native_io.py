"""Native .flo I/O + prefetching loader."""
import os

import numpy as np
import pytest

from optical_flow_tpu.io.flo import read_flo, write_flo
from optical_flow_tpu.native.build import load_floio


def test_native_lib_builds():
    lib = load_floio()
    if lib is None:
        pytest.skip("no C toolchain available")
    assert hasattr(lib, "flo_read") and hasattr(lib, "flo_write")


def test_native_roundtrip_matches_numpy(tmp_path, rng):
    flow = rng.standard_normal((23, 31, 2)).astype(np.float32)
    p1 = os.path.join(tmp_path, "a.flo")
    write_flo(flow, p1)  # native when available
    back = read_flo(p1)
    np.testing.assert_array_equal(back, flow)

    # cross-check against a hand-written numpy .flo file
    p2 = os.path.join(tmp_path, "b.flo")
    with open(p2, "wb") as f:
        np.array([202021.25], dtype=np.float32).tofile(f)
        np.array([31, 23], dtype=np.int32).tofile(f)
        flow.tofile(f)
    np.testing.assert_array_equal(read_flo(p2), flow)


def test_native_invalid_magic(tmp_path):
    p = os.path.join(tmp_path, "bad.flo")
    with open(p, "wb") as f:
        np.array([1.0], dtype=np.float32).tofile(f)
        np.array([4, 4], dtype=np.int32).tofile(f)
        np.zeros(32, dtype=np.float32).tofile(f)
    with pytest.raises(ValueError):
        read_flo(p)


def test_native_missing_file(tmp_path):
    with pytest.raises((FileNotFoundError, OSError)):
        read_flo(os.path.join(tmp_path, "nope.flo"))


def test_prefetch_loader(data_dir):
    from optical_flow_tpu.io.loader import middlebury_loader

    loader = middlebury_loader(["RubberWhale", "Dimetrodon"], data_dir)
    got = list(loader)
    assert len(got) == 2
    for im1, im2, tu, tv in got:
        assert im1.shape == im2.shape
        assert tu is not None
