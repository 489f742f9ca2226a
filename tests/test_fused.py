"""Whole-flow fused programs must match the per-level execution path."""
import jax.numpy as jnp
import numpy as np
import pytest

from optical_flow_tpu.config import load_of_method


def _pair(rng, h=40, w=44):
    im1 = rng.uniform(0, 255, (h, w))
    im2 = 0.9 * np.roll(im1, 1, axis=1) + 0.1 * rng.uniform(0, 255, (h, w))
    return jnp.stack([jnp.asarray(im1), jnp.asarray(im2)], 2)


@pytest.mark.parametrize(
    "method", ["hs-brightness", "classic-c-brightness", "classic+nl-fast", "classic-c-a"]
)
def test_fused_matches_unfused(rng, method):
    images = _pair(rng)

    def run(fuse):
        ope = load_of_method(method)
        ope.display = False
        ope.fuse = fuse
        if method == "classic-c-a":
            # keep the lambda2 annealing short so the noise input stays finite
            ope.max_iters = 4
        ope.images = images
        return np.asarray(ope.compute_flow())

    uv_a = run(False)
    uv_b = run(True)
    assert np.isfinite(uv_a).all() and np.isfinite(uv_b).all()
    # same math, but XLA may reassociate reductions across fusion boundaries
    np.testing.assert_allclose(uv_b, uv_a, atol=5e-3)
    assert np.abs(uv_b - uv_a).mean() < 1e-4


def test_video_sequence(rng):
    from optical_flow_tpu.parallel.video import estimate_flow_video

    T, H, W = 4, 40, 48
    base = rng.uniform(0, 255, (H, W))
    frames = np.stack([np.roll(base, t, axis=1) for t in range(T)])
    uv = np.asarray(estimate_flow_video(frames, "hs-brightness"))
    assert uv.shape == (T - 1, H, W, 2)
    np.testing.assert_allclose(uv[:, 8:-8, 8:-8, 0].mean(axis=(1, 2)), 1.0, atol=0.05)
