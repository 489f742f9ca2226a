"""Pyramid structure tests + parity with the reference pyramid builder."""
import numpy as np

from optical_flow_tpu.ops.pyramid import (
    auto_pyramid_levels,
    build_pyramid,
    pyramid_filter,
    pyramid_shapes,
)


def test_auto_levels_584x388():
    # reference formula: 1 + floor(log(388/16)/log(2)) = 5
    assert auto_pyramid_levels((584, 388), 2.0) == 5


def test_shapes_monotone_shrink():
    shapes = pyramid_shapes((64, 48), 4, 0.5)
    assert shapes[0] == (64, 48)
    for (h1, w1), (h2, w2) in zip(shapes, shapes[1:]):
        assert h2 < h1 and w2 < w1


def test_finest_is_input(rng):
    im = rng.uniform(0, 255, (32, 40))
    pyr = build_pyramid(im, 3, 2.0)
    np.testing.assert_allclose(np.asarray(pyr[0]), im)
    assert len(pyr) == 3


def test_parity_vs_reference(reference_pkg, rng):
    from optical_flow.utils.pyramid import compute_image_pyramid as ref_pyramid
    from optical_flow.utils.image_processing import fspecial_gaussian as ref_fspecial

    im = rng.uniform(0, 255, (37, 45))
    for spacing in (2.0, 1.25):
        f = pyramid_filter(spacing)
        # filter itself must match the reference construction
        smooth_sigma = np.sqrt(spacing) / np.sqrt(2)
        ksize = 2 * round(1.5 * smooth_sigma) + 1
        np.testing.assert_allclose(f, ref_fspecial(int(ksize), smooth_sigma))

        ref = ref_pyramid(im, f, 3, 1.0 / spacing)
        mine = build_pyramid(im, 3, spacing)
        assert len(ref) == len(mine)
        for r, m in zip(ref, mine):
            np.testing.assert_allclose(np.asarray(m), r, rtol=1e-10, atol=1e-10)


def test_parity_vs_reference_multichannel(reference_pkg, rng):
    from optical_flow.utils.pyramid import compute_image_pyramid as ref_pyramid

    im = rng.uniform(0, 255, (24, 30, 3))
    f = pyramid_filter(2.0)
    ref = ref_pyramid(im, f, 2, 0.5)
    mine = build_pyramid(im, 2, 2.0)
    np.testing.assert_allclose(np.asarray(mine[1]), ref[1], rtol=1e-10, atol=1e-10)
