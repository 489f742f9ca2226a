"""Occlusion, weighted median, and Li-Osher denoising parity tests."""
import numpy as np
import pytest

from optical_flow_tpu.ops.denoise import denoise_LO
from optical_flow_tpu.ops.occlusion import detect_occlusion
from optical_flow_tpu.ops.wmedian import (
    denoise_color_weighted_medfilt2,
    weighted_median_1d,
)


def test_occlusion_parity(reference_pkg, rng):
    from optical_flow.utils.occlusion import detect_occlusion as ref_occ

    h, w = 14, 18
    images = np.stack([rng.uniform(0, 255, (h, w)), rng.uniform(0, 255, (h, w))], 2)
    uv = 1.5 * rng.standard_normal((h, w, 2))
    ref = ref_occ(uv, images)
    mine = np.asarray(detect_occlusion(uv, images))
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-9)


def test_occlusion_identity_flow(rng):
    im = rng.uniform(0, 255, (10, 12))
    images = np.stack([im, im], 2)
    occ = np.asarray(detect_occlusion(np.zeros((10, 12, 2)), images))
    np.testing.assert_allclose(occ, 1.0, atol=1e-12)


def test_weighted_median_1d_parity(reference_pkg, rng):
    from optical_flow.utils.weighted_median import weighted_median_1d as ref_wm

    for _ in range(20):
        n = rng.integers(3, 40)
        u = rng.standard_normal(n)
        w = rng.uniform(0.01, 2.0, n)
        assert float(weighted_median_1d(w, u)) == pytest.approx(ref_wm(w, u))


def test_weighted_median_1d_with_ties(rng):
    # tied values must select the tie value regardless of weight permutation
    u = np.array([1.0, 2.0, 2.0, 2.0, 5.0])
    w = np.array([0.1, 0.4, 0.2, 0.4, 0.1])
    assert float(weighted_median_1d(w, u)) == 2.0


def test_wmedfilt_parity(reference_pkg, rng):
    from optical_flow.utils.weighted_median import (
        denoise_color_weighted_medfilt2 as ref_wmf,
    )

    h, w = 12, 14
    uv = rng.standard_normal((h, w, 2))
    color = rng.uniform(0, 255, (h, w, 3))
    occ = rng.uniform(0.1, 1.0, (h, w))
    ref = ref_wmf(uv.copy(), color, occ, 3, [5, 5], 7.0)
    mine = np.asarray(denoise_color_weighted_medfilt2(uv, color, occ, 3, [5, 5], 7.0))
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-10)


def test_wmedfilt_parity_chunked(reference_pkg, rng):
    """Row-chunked execution must be identical to single-pass."""
    from optical_flow.utils.weighted_median import (
        denoise_color_weighted_medfilt2 as ref_wmf,
    )

    h, w = 11, 9
    uv = rng.standard_normal((h, w, 2))
    color = rng.uniform(0, 255, (h, w, 3))
    occ = rng.uniform(0.1, 1.0, (h, w))
    ref = ref_wmf(uv.copy(), color, occ, 2, [5, 5], 7.0)
    mine = np.asarray(
        denoise_color_weighted_medfilt2(uv, color, occ, 2, [5, 5], 7.0, row_chunk=3)
    )
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-10)


def test_wmedfilt_fallback_plain_median(reference_pkg, rng):
    from optical_flow.utils.weighted_median import (
        denoise_color_weighted_medfilt2 as ref_wmf,
    )

    h, w = 10, 12
    uv = rng.standard_normal((h, w, 2))
    occ = rng.uniform(0.1, 1.0, (h, w))
    tiny_color = np.ones((1, 1, 3))
    ref = ref_wmf(uv.copy(), tiny_color, occ, 3, [5, 5], 7.0)
    mine = np.asarray(denoise_color_weighted_medfilt2(uv, tiny_color, occ, 3, [5, 5], 7.0))
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)


def test_wmedfilt_grayscale_guide(reference_pkg, rng):
    from optical_flow.utils.weighted_median import (
        denoise_color_weighted_medfilt2 as ref_wmf,
    )

    h, w = 10, 12
    uv = rng.standard_normal((h, w, 2))
    color = rng.uniform(0, 255, (h, w))  # 2-D grayscale guide
    occ = rng.uniform(0.1, 1.0, (h, w))
    ref = ref_wmf(uv.copy(), color.copy(), occ, 2, [5, 5], 7.0)
    mine = np.asarray(denoise_color_weighted_medfilt2(uv, color, occ, 2, [5, 5], 7.0))
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-10)


def test_denoise_lo_parity(reference_pkg, rng):
    from optical_flow.utils.denoising import denoise_LO as ref_lo

    un = rng.standard_normal((13, 15))
    for lam, iters in ((0.3, 1), (2.0, 3)):
        ref = ref_lo(un, [5, 5], lam, iters)
        mine = np.asarray(denoise_LO(un, [5, 5], lam, iters))
        np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)


def test_denoise_lo_none_size(rng):
    un = rng.standard_normal((6, 7))
    np.testing.assert_allclose(np.asarray(denoise_LO(un, None, 0.5)), un)


def test_wmedfilt_color_resize_fallback_unreachable_from_presets():
    """The guide-resize fallback (reference ``weighted_median.py:50-56``) is
    structurally unreachable from the presets.

    classic+nl builds its Lab color pyramid with the SAME
    ``build_pyramid(levels, spacing)`` schedule as the texture pyramid
    (``methods/classic_nl.py:117-121``), so the guide shape equals the flow
    shape at every level of both GNC pyramid sets.  Verified here across a
    sweep of input sizes with the presets' (auto-levels, 2.0) and (2, 1.25)
    schedules — a regression guard for anyone changing the color pyramid
    schedule independently of the texture one.
    """
    from optical_flow_tpu.ops.pyramid import auto_pyramid_levels, pyramid_shapes

    for hw in [(388, 584), (480, 640), (380, 420), (97, 133), (64, 64)]:
        for levels, spacing in [
            (auto_pyramid_levels(hw, 2.0), 2.0),
            (2, 1.25),
        ]:
            tex_shapes = pyramid_shapes(hw, levels, 1.0 / spacing)
            color_shapes = pyramid_shapes(hw, levels, 1.0 / spacing)
            assert tex_shapes == color_shapes
            # every level is evaluated with flow at the SAME shape schedule
            assert tex_shapes[0] == hw


def test_wmedfilt_color_resize_fallback_pinned(rng):
    """Pin the substituted semantics of the (never-hit) guide-resize fallback.

    When the guide is larger than the flow, the reference resizes it with
    ``skimage.transform.resize(..., anti_aliasing=False)``
    (``weighted_median.py:50-56``); this repo substitutes MATLAB-bilinear
    resize (``ops/wmedian.py:96-99``).  skimage is not installed in this
    environment, so no oracle for the reference's exact interpolant exists;
    instead the substitution itself is pinned: the fallback must equal
    calling the filter with an explicitly MATLAB-bilinear-resized guide.
    (Both are plain bilinear resamplings that differ only in coordinate
    convention; the path is unreachable from the presets — see the test
    above — so the delta cannot affect any published number.)
    """
    from optical_flow_tpu.ops.interp import matlab_imresize_bilinear

    h, w = 12, 14
    uv = rng.standard_normal((h, w, 2))
    occ = rng.uniform(0.1, 1.0, (h, w))
    big_color = rng.uniform(0, 255, (h * 2, w * 2, 3))

    out = np.asarray(
        denoise_color_weighted_medfilt2(uv, big_color, occ, 2, [5, 5], 7.0)
    )
    resized = np.asarray(matlab_imresize_bilinear(big_color, (h, w)))
    expected = np.asarray(
        denoise_color_weighted_medfilt2(uv, resized, occ, 2, [5, 5], 7.0)
    )
    np.testing.assert_allclose(out, expected, rtol=1e-12, atol=1e-12)
