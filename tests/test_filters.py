"""Stencil correlation / median filters vs scipy.ndimage oracles."""
import numpy as np
import pytest
from scipy.ndimage import correlate as sp_correlate, median_filter as sp_median

from optical_flow_tpu.ops.filters import correlate2d, correlate2d_multi, median_filter2d

KERNELS = [
    np.array([[1.0, -8.0, 0.0, 8.0, -1.0]]) / 12.0,  # 1x5 deriv filter
    (np.array([[1.0, -8.0, 0.0, 8.0, -1.0]]) / 12.0).T,  # 5x1
    np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=float),  # laplacian
    np.outer([1, -8, 0, 8, -1], [1, -8, 0, 8, -1]) / 144.0,  # cross-deriv
    np.array([[1.0, -1.0]]),  # even-size horizontal diff
]


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("boundary", ["reflect", "nearest"])
def test_correlate2d_matches_scipy(rng, kernel, boundary):
    im = rng.standard_normal((13, 17))
    mine = np.asarray(correlate2d(im, kernel, boundary))
    ref = sp_correlate(im, kernel, mode=boundary)
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)


def test_correlate2d_multi_channels(rng):
    im = rng.standard_normal((9, 11, 3))
    k = KERNELS[2]
    mine = np.asarray(correlate2d_multi(im, k))
    for c in range(3):
        np.testing.assert_allclose(mine[:, :, c], sp_correlate(im[:, :, c], k, mode="reflect"))


@pytest.mark.parametrize("size", [3, 5, (5, 5), (3, 5)])
def test_median_filter_matches_scipy(rng, size):
    im = rng.standard_normal((14, 16))
    mine = np.asarray(median_filter2d(im, size))
    ref = sp_median(im, size=size, mode="reflect")
    np.testing.assert_allclose(mine, ref)


def test_median_network_construction():
    """The pruned Batcher selection network is a correct median selector.

    0-1 principle: the FULL network must sort every 0/1 sequence (checked
    exhaustively through m=16); the pruned network + +inf padding must then
    agree with np.median / the rank-(n//2) statistic on adversarial data
    (duplicates, ties, integer grids) for every window count in use.
    """
    import itertools

    from optical_flow_tpu.ops.filters import _batcher_pairs, _median_network

    for m in (2, 4, 8, 16):
        pairs = _batcher_pairs(m)
        for bits in itertools.product([0, 1], repeat=m):
            v = list(bits)
            for a, b in pairs:
                if v[a] > v[b]:
                    v[a], v[b] = v[b], v[a]
            assert v == sorted(v), f"Batcher m={m} failed on {bits}"

    rng = np.random.default_rng(3)
    for n in (9, 15, 16, 25, 49):
        pairs, m, target = _median_network(n)
        for _ in range(200):
            x = rng.integers(0, 4, n).astype(float)  # tie-heavy
            v = list(x) + [np.inf] * (m - n)
            for a, b in pairs:
                if v[a] > v[b]:
                    v[a], v[b] = v[b], v[a]
            assert v[target] == np.sort(x)[n // 2]


def test_median_network_nan_semantics(rng):
    """The min/max network must place NaNs LAST, like jnp.sort.

    min/max propagate NaN, so the naive network turns one bad pixel into a
    k×k NaN patch per median pass; the sort path instead self-heals isolated
    solver NaNs.  Pin: a single NaN pixel yields a fully finite median
    field, and a majority-NaN window yields NaN exactly where the sort
    would (regression test for the network NaN-poisoning bug).
    """
    import jax.numpy as jnp

    im = rng.standard_normal((12, 14)).astype(np.float32)
    im_nan = im.copy()
    im_nan[5, 7] = np.nan
    for size in (3, 5):
        out = np.asarray(median_filter2d(im_nan, size))
        assert np.isfinite(out).all(), f"one NaN spread through a {size}x{size} window"
        # away from the NaN pixel the result is untouched
        clean = np.asarray(median_filter2d(im, size))
        far = np.ones_like(out, bool)
        far[5 - size : 5 + size + 1, 7 - size : 7 + size + 1] = False
        np.testing.assert_array_equal(out[far], clean[far])
    # majority-NaN region: both the network path and the explicit sort
    # rank-select agree (NaN where > half the window is NaN)
    im_bad = im.copy()
    im_bad[2:9, 2:9] = np.nan
    for size in (3, 5):
        out = np.asarray(median_filter2d(im_bad, size))
        k = size * size
        pad = size // 2
        padded = np.pad(im_bad, pad, mode="symmetric")
        stacks = np.stack(
            [
                padded[dy : dy + 12, dx : dx + 14]
                for dy in range(size)
                for dx in range(size)
            ],
            axis=-1,
        )
        ref = np.asarray(jnp.sort(jnp.asarray(stacks), axis=-1))[..., k // 2]
        np.testing.assert_array_equal(out, ref)


def test_median_filter_network_large_window_and_dtypes(rng):
    """Even windows, integral data, and the >49 sort fallback all match scipy."""
    im = rng.integers(0, 6, (23, 19)).astype(np.float64)  # heavy duplicates
    for size in (4, 7, (5, 3)):
        np.testing.assert_array_equal(
            np.asarray(median_filter2d(im, size)),
            sp_median(im, size=size, mode="reflect"),
        )
    # 9x9 window (81 > 49): the sort path
    np.testing.assert_array_equal(
        np.asarray(median_filter2d(im, 9)), sp_median(im, size=9, mode="reflect")
    )
