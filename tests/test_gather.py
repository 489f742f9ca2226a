"""Gather implementations: exactness of the displacement-tiered sweep."""
import numpy as np
import jax.numpy as jnp
import pytest

from optical_flow_tpu.ops.gather import gather_displaced, gather_planes


def _case(rng, H, W, K, max_disp):
    planes = rng.standard_normal((H, W, K)).astype(np.float32)
    ii, jj = np.mgrid[0:H, 0:W]
    iy = np.clip(ii + rng.integers(-max_disp, max_disp + 1, (H, W)), 0, H - 1).astype(np.int32)
    ix = np.clip(jj + rng.integers(-max_disp, max_disp + 1, (H, W)), 0, W - 1).astype(np.int32)
    return planes, iy, ix


@pytest.mark.parametrize("max_disp", [0, 2, 5, 9, 40])
def test_gather_displaced_all_tiers(rng, max_disp):
    """Every tier (and the fallback for large motion) must be exact."""
    H, W, K = 48, 56, 16
    planes, iy, ix = _case(rng, H, W, K, max_disp)
    expect = planes[iy, ix]
    got = np.asarray(gather_displaced(jnp.asarray(planes), jnp.asarray(iy), jnp.asarray(ix)))
    np.testing.assert_array_equal(got, expect)


def test_gather_planes_default(rng):
    planes, iy, ix = _case(rng, 20, 24, 4, 3)
    got = np.asarray(gather_planes(jnp.asarray(planes), jnp.asarray(iy), jnp.asarray(ix)))
    np.testing.assert_array_equal(got, planes[iy, ix])


def test_gather_displaced_arbitrary_indices(rng):
    """Fully random (unbounded) indices exercise the gather fallback."""
    H, W, K = 30, 34, 3
    planes = rng.standard_normal((H, W, K)).astype(np.float32)
    iy = rng.integers(0, H, (H, W)).astype(np.int32)
    ix = rng.integers(0, W, (H, W)).astype(np.int32)
    got = np.asarray(gather_displaced(jnp.asarray(planes), jnp.asarray(iy), jnp.asarray(ix)))
    np.testing.assert_array_equal(got, planes[iy, ix])
