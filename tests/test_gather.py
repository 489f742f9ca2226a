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


def test_gather_displaced_vmap_batched(rng):
    """vmap must hit the custom batching rule (one batch-wide tier decision,
    no per-element cond), and stay exact — including mixed in_axes."""
    import jax

    H, W, K, B = 24, 40, 4, 3
    planes = rng.standard_normal((B, H, W, K)).astype(np.float32)
    ii, jj = np.mgrid[0:H, 0:W]
    iy = np.clip(ii + rng.integers(-3, 4, (B, H, W)), 0, H - 1).astype(np.int32)
    ix = np.clip(jj + rng.integers(-3, 4, (B, H, W)), 0, W - 1).astype(np.int32)
    expect = np.stack([planes[b][iy[b], ix[b]] for b in range(B)])

    got = np.asarray(jax.jit(jax.vmap(gather_displaced))(planes, iy, ix))
    np.testing.assert_array_equal(got, expect)

    # shared planes across the batch (in_axes=(None, 0, 0))
    got_shared = np.asarray(
        jax.vmap(gather_displaced, in_axes=(None, 0, 0))(planes[0], iy, ix)
    )
    np.testing.assert_array_equal(
        got_shared, np.stack([planes[0][iy[b], ix[b]] for b in range(B)])
    )

    # large displacement: batch-wide fallback branch
    iy_big = rng.integers(0, H, (B, H, W)).astype(np.int32)
    got_big = np.asarray(jax.vmap(gather_displaced)(planes, iy_big, ix))
    np.testing.assert_array_equal(
        got_big, np.stack([planes[b][iy_big[b], ix[b]] for b in range(B)])
    )


def test_gather_displaced_blocked_sweep_exact(rng, monkeypatch):
    """The row-blocked sweep variant (H >= _BLOCK_MIN_H, or forced) is exact.

    Blocks pay only their LOCAL displacement rectangle; this pins equality
    with the plain gather across block boundaries, non-divisible heights,
    per-block empty/full rectangles, and the big-displacement fallback.
    """
    import importlib

    import optical_flow_tpu.ops.gather as g

    monkeypatch.setattr(g, "GATHER_IMPL", "displaced_blocked")
    monkeypatch.setattr(g, "_BLOCK_ROWS", 16)  # many blocks at test sizes

    for H, W, K, mag in [(50, 33, 3, 2), (64, 20, 5, 5), (47, 28, 2, 0)]:
        planes = rng.standard_normal((H, W, K)).astype(np.float32)
        ii, jj = np.mgrid[0:H, 0:W]
        iy = np.clip(ii + rng.integers(-mag, mag + 1, (H, W)), 0, H - 1).astype(np.int32)
        ix = np.clip(jj + rng.integers(-mag, mag + 1, (H, W)), 0, W - 1).astype(np.int32)
        got = np.asarray(g.gather_displaced(planes, iy, ix))
        np.testing.assert_array_equal(got, planes[iy, ix])

    # fallback (D > tier) under the blocked setting
    H, W, K = 40, 30, 2
    planes = rng.standard_normal((H, W, K)).astype(np.float32)
    iy = rng.integers(0, H, (H, W)).astype(np.int32)
    ix = rng.integers(0, W, (H, W)).astype(np.int32)
    got = np.asarray(g.gather_displaced(planes, iy, ix))
    np.testing.assert_array_equal(got, planes[iy, ix])
