"""Horn-Schunck integration tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from optical_flow_tpu.config import load_of_method


def test_zero_flow_on_identical_frames(rng):
    im = rng.uniform(0, 255, (40, 44))
    ope = load_of_method("hs-brightness")
    ope.images = jnp.stack([jnp.asarray(im), jnp.asarray(im)], 2)
    uv = np.asarray(ope.compute_flow())
    assert np.abs(uv).max() < 0.1


def test_recovers_one_pixel_shift(synthetic_pair):
    im1, im2 = synthetic_pair
    ope = load_of_method("hs-brightness")
    ope.images = jnp.stack([jnp.asarray(im1), jnp.asarray(im2)], 2)
    uv = np.asarray(ope.compute_flow())
    assert uv[8:-8, 8:-8, 0].mean() == pytest.approx(1.0, abs=0.05)
    assert abs(uv[8:-8, 8:-8, 1].mean()) < 0.05


def test_full_parity_vs_reference(reference_pkg, rng):
    """Whole coarse-to-fine HS vs the NumPy reference on a small pair.

    Solver difference (tight CG vs spsolve) bounds agreement; the flow
    fields must still match closely.
    """
    from optical_flow.methods.config import load_of_method as ref_load

    im1 = rng.uniform(0, 255, (36, 40))
    im2 = np.roll(im1, 1, axis=1) * 0.98 + 0.02 * rng.uniform(0, 255, (36, 40))

    ref_ope = ref_load("hs-brightness")
    ref_ope.images = np.stack([im1, im2], 2)
    ref_uv = ref_ope.compute_flow(np.zeros((36, 40, 2)))

    ope = load_of_method("hs-brightness")
    ope.dtype = jnp.float64
    ope.backslash_rtol = 1e-12
    ope.backslash_maxiter = 5000
    ope.images = jnp.stack([jnp.asarray(im1), jnp.asarray(im2)], 2)
    uv = np.asarray(ope.compute_flow())

    np.testing.assert_allclose(uv, ref_uv, atol=5e-3)


@pytest.mark.slow
def test_rubberwhale_aae_regression(rubberwhale):
    """HS on RubberWhale: AAE < 20 degrees (reference test_hs.py:37-53)."""
    from optical_flow_tpu.evaluation.metrics import flow_angular_error
    from optical_flow_tpu.interface import estimate_flow

    im1, im2, tu, tv = rubberwhale
    uv = np.asarray(estimate_flow(im1, im2, "hs", params={"display": False}))
    aae, _, aepe = flow_angular_error(tu, tv, uv[:, :, 0], uv[:, :, 1])
    assert aae < 20.0
