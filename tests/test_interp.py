"""Interpolation parity vs scipy map_coordinates and the MATLAB resize."""
import numpy as np
import pytest
from scipy.ndimage import map_coordinates, spline_filter

from optical_flow_tpu.ops.interp import (
    bspline_prefilter_matrix,
    matlab_imresize_bilinear,
    matlab_resize_matrix,
    sample_bilinear,
    sample_cubic_spline,
    spline_coeffs_2d,
)


def test_prefilter_matrix_matches_scipy(rng):
    im = rng.standard_normal((11, 9))
    mine = np.asarray(spline_coeffs_2d(im))
    ref = spline_filter(im, order=3, mode="constant")
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-10)


def test_cubic_spline_interior_matches_scipy(rng):
    im = rng.standard_normal((12, 10))
    coeffs = spline_coeffs_2d(im)
    ys, xs = np.meshgrid(np.linspace(0, 11, 45), np.linspace(0, 9, 37), indexing="ij")
    mine, oob = sample_cubic_spline(coeffs, ys, xs)
    ref = map_coordinates(im, [ys.ravel(), xs.ravel()], order=3, mode="constant", cval=np.nan)
    assert not np.asarray(oob).any()
    np.testing.assert_allclose(np.asarray(mine).ravel(), ref, rtol=1e-9, atol=1e-9)


def test_cubic_spline_oob_mask(rng):
    im = rng.standard_normal((8, 8))
    coeffs = spline_coeffs_2d(im)
    ys = np.array([-0.1, 0.0, 7.0, 7.1])
    xs = np.array([3.0, 3.0, 3.0, 3.0])
    _, oob = sample_cubic_spline(coeffs, ys, xs)
    np.testing.assert_array_equal(np.asarray(oob), [True, False, False, True])


def test_bilinear_matches_scipy_nearest(rng):
    im = rng.standard_normal((9, 13))
    ys, xs = np.meshgrid(np.linspace(-1, 9.5, 23), np.linspace(-0.5, 13.2, 29), indexing="ij")
    mine = np.asarray(sample_bilinear(im, ys, xs, mode="nearest"))
    ref = map_coordinates(im, [ys.ravel(), xs.ravel()], order=1, mode="nearest").reshape(ys.shape)
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_in,ratio", [(10, 0.5), (13, 0.5), (10, 0.8), (7, 1.0 / 1.25)])
def test_matlab_resize_matrix_rows_sum_to_one(n_in, ratio):
    from optical_flow_tpu.utils.compat import matlab_round

    n_out = max(1, matlab_round(n_in * ratio))
    M = matlab_resize_matrix(n_in, n_out)
    np.testing.assert_allclose(M.sum(axis=1), 1.0)


def test_matlab_imresize_matches_reference(reference_pkg, rng):
    from optical_flow.utils.pyramid import _matlab_imresize_bilinear

    im = rng.standard_normal((14, 18))
    for ratio in (0.5, 0.8, 1.0 / 1.25):
        ref = _matlab_imresize_bilinear(im, ratio)
        mine = np.asarray(matlab_imresize_bilinear(im, ref.shape[:2]))
        np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)


def test_matlab_imresize_multichannel(reference_pkg, rng):
    from optical_flow.utils.pyramid import _matlab_imresize_bilinear

    im = rng.standard_normal((12, 10, 3))
    ref = _matlab_imresize_bilinear(im, 0.5)
    mine = np.asarray(matlab_imresize_bilinear(im, ref.shape[:2]))
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)
