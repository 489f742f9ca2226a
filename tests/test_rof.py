"""ROF structure-texture decomposition parity."""
import numpy as np

from optical_flow_tpu.ops.rof import structure_texture_decomposition_rof


def test_output_range(rng):
    im = rng.uniform(0, 255, (20, 24))
    tex = np.asarray(structure_texture_decomposition_rof(im))
    assert tex.min() >= -1e-9 and tex.max() <= 255 + 1e-9


def test_parity_vs_reference_gray(reference_pkg, rng):
    from optical_flow.utils.image_processing import (
        structure_texture_decomposition_rof as ref_rof,
    )

    im = rng.uniform(0, 255, (18, 22))
    ref = ref_rof(im)
    mine = np.asarray(structure_texture_decomposition_rof(im))
    np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-8)


def test_parity_vs_reference_pair(reference_pkg, rng):
    """The method pipeline calls ROF on the stacked (H, W, 2) frame pair with
    *global* normalization — the parity-critical case."""
    from optical_flow.utils.image_processing import (
        structure_texture_decomposition_rof as ref_rof,
    )

    images = rng.uniform(0, 255, (16, 20, 2))
    ref = ref_rof(images, 1.0 / 8, 100, 0.95)
    mine = np.asarray(structure_texture_decomposition_rof(images, 1.0 / 8, 100, 0.95))
    np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-8)
