"""Warping + spatiotemporal derivative kernel tests and reference parity."""
import numpy as np
import pytest

from optical_flow_tpu.ops.derivatives import partial_deriv

METHODS = ["cubic", "bi-linear", "bi-cubic"]


def _images(rng, h=18, w=22):
    im1 = rng.uniform(0, 255, (h, w))
    im2 = rng.uniform(0, 255, (h, w))
    return np.stack([im1, im2], axis=2)


@pytest.mark.parametrize("method", METHODS)
def test_it_zero_on_identical_frames(rng, method):
    im = rng.uniform(0, 255, (16, 20))
    images = np.stack([im, im], axis=2)
    uv = np.zeros((16, 20, 2))
    It, Ix, Iy = partial_deriv(images, uv, method)
    np.testing.assert_allclose(np.asarray(It), 0.0, atol=1e-9)


def test_ix_on_linear_ramp():
    x = np.arange(24, dtype=float)
    im = np.tile(x, (16, 1))
    images = np.stack([im, im], axis=2)
    uv = np.zeros((16, 24, 2))
    It, Ix, Iy = partial_deriv(images, uv, "cubic")
    np.testing.assert_allclose(np.asarray(Ix)[4:-4, 4:-4], 1.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Iy)[4:-4, 4:-4], 0.0, atol=1e-9)


@pytest.mark.parametrize("method", METHODS)
def test_parity_vs_reference(reference_pkg, rng, method):
    from optical_flow.utils.derivatives import partial_deriv as ref_partial_deriv

    images = _images(rng)
    uv = 0.8 * rng.standard_normal((18, 22, 2))
    ref_It, ref_Ix, ref_Iy = ref_partial_deriv(images, uv, method)
    It, Ix, Iy = partial_deriv(images, uv, method)
    np.testing.assert_allclose(np.asarray(It), ref_It, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ix), ref_Ix, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Iy), ref_Iy, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("method", METHODS)
def test_parity_large_flow_oob(reference_pkg, rng, method):
    """Large displacements exercise the out-of-bounds masking paths."""
    from optical_flow.utils.derivatives import partial_deriv as ref_partial_deriv

    images = _images(rng, 14, 16)
    uv = 6.0 * rng.standard_normal((14, 16, 2))
    ref_It, ref_Ix, ref_Iy = ref_partial_deriv(images, uv, method)
    It, Ix, Iy = partial_deriv(images, uv, method)
    np.testing.assert_allclose(np.asarray(It), ref_It, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ix), ref_Ix, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Iy), ref_Iy, rtol=1e-8, atol=1e-8)


def test_parity_with_blend(reference_pkg, rng):
    from optical_flow.utils.derivatives import partial_deriv as ref_partial_deriv

    images = _images(rng)
    uv = 0.5 * rng.standard_normal((18, 22, 2))
    for blend in (0.5, 0.0, 1.0):
        ref = ref_partial_deriv(images, uv, "cubic", None, blend)
        mine = partial_deriv(images, uv, "cubic", None, blend)
        for m, r in zip(mine, ref):
            np.testing.assert_allclose(np.asarray(m), r, rtol=1e-8, atol=1e-8)
