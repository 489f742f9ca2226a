"""Stencil correlation / median filters vs scipy.ndimage oracles."""
import numpy as np
import pytest
from scipy.ndimage import correlate as sp_correlate, median_filter as sp_median

from optical_flow_tpu.ops.filters import correlate2d, correlate2d_multi, median_filter2d

KERNELS = [
    np.array([[1.0, -8.0, 0.0, 8.0, -1.0]]) / 12.0,  # 1x5 deriv filter
    (np.array([[1.0, -8.0, 0.0, 8.0, -1.0]]) / 12.0).T,  # 5x1
    np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=float),  # laplacian
    np.outer([1, -8, 0, 8, -1], [1, -8, 0, 8, -1]) / 144.0,  # cross-deriv
    np.array([[1.0, -1.0]]),  # even-size horizontal diff
]


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("boundary", ["reflect", "nearest"])
def test_correlate2d_matches_scipy(rng, kernel, boundary):
    im = rng.standard_normal((13, 17))
    mine = np.asarray(correlate2d(im, kernel, boundary))
    ref = sp_correlate(im, kernel, mode=boundary)
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)


def test_correlate2d_multi_channels(rng):
    im = rng.standard_normal((9, 11, 3))
    k = KERNELS[2]
    mine = np.asarray(correlate2d_multi(im, k))
    for c in range(3):
        np.testing.assert_allclose(mine[:, :, c], sp_correlate(im[:, :, c], k, mode="reflect"))


@pytest.mark.parametrize("size", [3, 5, (5, 5), (3, 5)])
def test_median_filter_matches_scipy(rng, size):
    im = rng.standard_normal((14, 16))
    mine = np.asarray(median_filter2d(im, size))
    ref = sp_median(im, size=size, mode="reflect")
    np.testing.assert_allclose(mine, ref)
