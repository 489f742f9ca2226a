"""Operator-vs-oracle tests for the explicit-matrix compat shims.

Mirrors the reference's test_sparse_ops.py taxonomy: conv matrix vs
scipy.signal.convolve2d, shape contracts, boundary semantics — plus the
structural identity underpinning the whole framework: the reference's
Fᵀ W F spatial matrices equal the matrix-free stencil operators.
"""
import numpy as np
import pytest
from scipy.signal import convolve2d
from scipy.ndimage import correlate as sp_correlate

from optical_flow_tpu.ops.sparse_compat import convmtxn, make_convn_mat, make_imfilter_mat


def _vecF(x):
    return x.ravel(order="F")


@pytest.mark.parametrize("fshape", [(1, 2), (2, 1), (3, 3), (2, 3)])
def test_convmtxn_matches_scipy_full(rng, fshape):
    F = rng.standard_normal(fshape)
    x = rng.standard_normal((6, 7))
    M = convmtxn(F, x.shape)
    ref = convolve2d(x, F, mode="full")
    np.testing.assert_allclose(M @ _vecF(x), _vecF(ref), atol=1e-12)


def test_make_convn_mat_shapes(rng):
    F = rng.standard_normal((1, 2))
    H, W = 5, 6
    assert make_convn_mat(F, (H, W), "full").shape == ((H) * (W + 1), H * W)
    assert make_convn_mat(F, (H, W), "same").shape == (H * W, H * W)
    assert make_convn_mat(F, (H, W), "valid").shape == (H * (W - 1), H * W)
    assert make_convn_mat(F, (H, W), "valid", "sameswap").shape == (H * W, H * W)


def test_sameswap_is_forward_difference(rng):
    """'valid'+'sameswap' with [[1,-1]] == forward diff, zero last column —
    the identity that makes the spatial term a stencil."""
    from optical_flow_tpu.ops.stencil import forward_diff_h, forward_diff_v

    H, W = 5, 6
    x = rng.standard_normal((H, W))
    Mh = make_convn_mat(np.array([[1.0, -1.0]]), (H, W), "valid", "sameswap")
    np.testing.assert_allclose(
        (Mh @ _vecF(x)).reshape((H, W), order="F"),
        np.asarray(forward_diff_h(x)),
        atol=1e-12,
    )
    Mv = make_convn_mat(np.array([[1.0], [-1.0]]), (H, W), "valid", "sameswap")
    np.testing.assert_allclose(
        (Mv @ _vecF(x)).reshape((H, W), order="F"),
        np.asarray(forward_diff_v(x)),
        atol=1e-12,
    )


@pytest.mark.parametrize("boundary,mode", [("replicate", "nearest"), ("symmetric", "reflect")])
def test_imfilter_mat_boundaries(rng, boundary, mode):
    F = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=float)
    x = rng.standard_normal((6, 5))
    M = make_imfilter_mat(F, x.shape, boundary=boundary)
    ref = sp_correlate(x, F, mode=mode)
    np.testing.assert_allclose(
        (M @ _vecF(x)).reshape(x.shape, order="F"), ref, atol=1e-12
    )


def test_imfilter_mat_zero_boundary(rng):
    F = np.ones((3, 3))
    x = rng.standard_normal((5, 5))
    M = make_imfilter_mat(F, x.shape, boundary="0")
    ref = sp_correlate(x, F, mode="constant", cval=0.0)
    np.testing.assert_allclose(
        (M @ _vecF(x)).reshape(x.shape, order="F"), ref, atol=1e-12
    )


def test_parity_vs_reference_sparse_ops(reference_pkg, rng):
    from optical_flow.utils.sparse_ops import (
        make_convn_mat as ref_conv,
        make_imfilter_mat as ref_imf,
    )

    F = np.array([[1.0, -1.0]])
    sz = (5, 6)
    np.testing.assert_allclose(
        make_convn_mat(F, sz, "valid", "sameswap"),
        ref_conv(F, sz, "valid", "sameswap").toarray(),
        atol=1e-12,
    )
    L = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=float)
    np.testing.assert_allclose(
        make_imfilter_mat(L, sz, "replicate"),
        ref_imf(L, sz, "replicate").toarray(),
        atol=1e-12,
    )


def test_interp2_bicubic_reference_surface(reference_pkg, rng):
    """The 1-based compat wrapper must match the reference exactly."""
    from optical_flow.utils.derivatives import interp2_bicubic as ref_interp

    from optical_flow_tpu.ops.derivatives import interp2_bicubic

    Z = rng.uniform(0, 255, (12, 14))
    XI, YI = np.meshgrid(
        np.linspace(0.5, 14.5, 17), np.linspace(0.5, 12.5, 15)
    )
    f = np.array([1, -8, 0, 8, -1]) / 12.0
    rZ, rX, rY = ref_interp(Z, XI, YI, f)
    mZ, mX, mY = interp2_bicubic(Z, XI, YI, f)
    nan = np.isnan(rZ)
    np.testing.assert_array_equal(np.isnan(np.asarray(mZ)), nan)
    np.testing.assert_allclose(np.asarray(mZ)[~nan], rZ[~nan], atol=1e-9)
