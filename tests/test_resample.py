"""Flow resampling parity (incl. the MATLAB height-ratio quirk)."""
import numpy as np

from optical_flow_tpu.ops.resample import resample_flow


def test_upscale_doubles_magnitude(rng):
    uv = np.stack([np.full((16, 16), 2.0), np.full((16, 16), -1.0)], axis=-1)
    out = np.asarray(resample_flow(uv, (32, 32)))
    np.testing.assert_allclose(out[:, :, 0], 4.0, rtol=1e-6)
    np.testing.assert_allclose(out[:, :, 1], -2.0, rtol=1e-6)


def test_identity_when_same_size(rng):
    uv = rng.standard_normal((8, 9, 2))
    out = np.asarray(resample_flow(uv, (8, 9)))
    np.testing.assert_allclose(out, uv)


def test_height_ratio_scales_both_components(reference_pkg, rng):
    from optical_flow.utils.warping import resample_flow as ref_resample

    uv = rng.standard_normal((20, 14, 2))
    for target in ((10, 7), (25, 18), (16, 20)):
        ref = ref_resample(uv, target)
        mine = np.asarray(resample_flow(uv, target))
        np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-12)
