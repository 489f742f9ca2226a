"""Whole-flow fused programs must match the per-level execution path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optical_flow_tpu.config import load_of_method


@pytest.fixture(autouse=True)
def _drop_compiled_programs_per_test():
    """Per-TEST cache clearing (this module compiles ~17 whole-flow monoliths).

    The per-module clearing in conftest.py is not enough here: XLA:CPU on this
    jaxlib hard-aborts the process (SIGABRT) on a large compile once too many
    big executables are live in one process, and this module alone accumulates
    enough monoliths to trip it when it runs after the rest of the suite.
    Costs a few recompiles of shared level programs; keeps the canonical
    `python -m pytest tests/ -q` invocation alive.
    """
    yield
    jax.clear_caches()


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


def _rgb_pair(rng, h=40, w=44):
    im1 = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    im2 = np.roll(im1, 1, axis=1)
    im2[:, 0] = rng.integers(0, 256, (h, 3))
    return im1, im2


@pytest.mark.parametrize("method", ["hs", "ba", "classic+nl-fast", "classic-c-a"])
def test_from_rgb_single_dispatch_matches_per_stage(rng, method):
    """estimate_flow's fused from-RGB monolith == the per-stage path.

    Covers the uint8 shipping too: PNG-style integral float frames must take
    the uint8 transfer and reproduce the float pipeline exactly.
    """
    from optical_flow_tpu.interface import estimate_flow

    im1, im2 = _rgb_pair(rng)
    params = {"display": False}
    if method == "classic-c-a":
        params["max_iters"] = 4
    uv_fused = np.asarray(estimate_flow(im1, im2, method, {**params, "fuse": True}))
    uv_plain = np.asarray(estimate_flow(im1, im2, method, {**params, "fuse": False}))
    assert np.isfinite(uv_fused).all()
    np.testing.assert_allclose(uv_fused, uv_plain, atol=5e-3)
    assert np.abs(uv_fused - uv_plain).mean() < 1e-4
    # uint8 ndarray input lands on the same jitted program (cache hit) and
    # must give the identical flow
    uv_u8 = np.asarray(
        estimate_flow(im1.astype(np.uint8), im2.astype(np.uint8), method, {**params, "fuse": True})
    )
    np.testing.assert_array_equal(uv_u8, uv_fused)


@pytest.mark.parametrize("method", ["hs", "ba", "classic+nl-fast", "classic-c-a"])
def test_from_gray_single_dispatch_matches_per_stage(rng, method):
    """The fused from-GRAY monolith == the per-stage grayscale path.

    Grayscale pairs ship uint8 when exact (8x fewer link bytes than the f32
    stack); for classic+nl the weighted-median guide must be the raw first
    frame (reference interface.py:61-63), identical to the per-stage path.
    """
    from optical_flow_tpu.interface import estimate_flow

    im1 = rng.integers(0, 256, (40, 44)).astype(np.float64)
    # keep the pair mostly-coherent (and integral, so the uint8 shipping
    # path stays on): classic-c-a legitimately diverges on pure noise
    im2 = np.round(0.9 * np.roll(im1, 1, axis=1) + 0.1 * rng.integers(0, 256, (40, 44)))
    params = {"display": False}
    if method == "classic-c-a":
        params["max_iters"] = 4
    uv_fused = np.asarray(estimate_flow(im1, im2, method, {**params, "fuse": True}))
    uv_plain = np.asarray(estimate_flow(im1, im2, method, {**params, "fuse": False}))
    assert np.isfinite(uv_fused).all()
    np.testing.assert_allclose(uv_fused, uv_plain, atol=5e-3)
    assert np.abs(uv_fused - uv_plain).mean() < 1e-4
    # uint8 input lands on the same jitted program and gives identical flow
    uv_u8 = np.asarray(
        estimate_flow(im1.astype(np.uint8), im2.astype(np.uint8), method, {**params, "fuse": True})
    )
    np.testing.assert_array_equal(uv_u8, uv_fused)


def test_out_dtype_casts_on_device(rng):
    """out_dtype='float16' halves the flow download; values match f32."""
    from optical_flow_tpu.interface import estimate_flow

    im1 = rng.integers(0, 256, (40, 44)).astype(np.float64)
    im2 = np.roll(im1, 1, axis=1)
    for extra in ({}, {"fuse": True}):  # per-level path and fused monolith
        params = {"display": False, **extra}
        uv32 = np.asarray(estimate_flow(im1, im2, "hs-brightness", params))
        uv16 = np.asarray(
            estimate_flow(im1, im2, "hs-brightness", {**params, "out_dtype": "float16"})
        )
        assert uv16.dtype == np.float16
        np.testing.assert_allclose(uv16, uv32, atol=2e-3)

    # batched serving paths honor it too
    from optical_flow_tpu.parallel.batch import estimate_flow_batched

    pairs = np.stack([np.stack([im1, im2], -1)] * 2)
    uvb = np.asarray(
        estimate_flow_batched(
            pairs, "hs-brightness", params={"display": False, "out_dtype": "float16"}
        )
    )
    assert uvb.dtype == np.float16


def test_ship_exact_representations():
    from optical_flow_tpu.interface import _ship_exact

    f = np.arange(12, dtype=np.float64).reshape(3, 4)
    assert _ship_exact(f, jnp.float32).dtype == np.uint8  # integral in [0,255]
    assert _ship_exact(f + 0.5, jnp.float32).dtype == jnp.float32
    assert _ship_exact(f * 100, jnp.float32).dtype == jnp.float32  # 1100 > 255
    assert _ship_exact(f.astype(np.uint8), jnp.float32).dtype == np.uint8
    assert _ship_exact(f.astype(np.int64), jnp.float32).dtype == np.uint8
    assert _ship_exact((f * 100).astype(np.int64), jnp.float32).dtype == np.int32


def test_batched_from_rgb_matches_single(rng):
    """Vmapped from-RGB monolith == per-pair from-RGB monolith, with color."""
    from optical_flow_tpu.interface import estimate_flow
    from optical_flow_tpu.parallel.batch import estimate_flow_batched_rgb

    from scipy.ndimage import gaussian_filter

    B = 3

    def smooth_rgb():
        # smooth + integral frames: tie-prone random data flips weighted-
        # median selections under reassociated vmap reductions; real frames
        # (what this path serves) are smooth, and integral values keep the
        # uint8 shipping path on
        chans = [gaussian_filter(rng.uniform(0, 1, (32, 36)), 1.5) for _ in range(3)]
        x = np.stack(chans, -1)
        return np.round(255 * (x - x.min()) / np.ptp(x))

    im1b = np.stack([smooth_rgb() for _ in range(B)])
    im2b = np.roll(im1b, 1, axis=2)
    params = {"display": False, "fuse": True}
    uvb = np.asarray(estimate_flow_batched_rgb(im1b, im2b, "classic+nl-fast", params=params))
    assert uvb.shape == (B, 32, 36, 2)
    for i in range(B):
        uv1 = np.asarray(estimate_flow(im1b[i], im2b[i], "classic+nl-fast", params))
        np.testing.assert_allclose(uvb[i], uv1, atol=5e-3)


def test_stream_matches_per_pair(rng):
    """Pipelined stream yields the same flows as synchronous per-pair calls."""
    from optical_flow_tpu.interface import estimate_flow
    from optical_flow_tpu.parallel.video import estimate_flow_stream

    pairs = []
    base = rng.uniform(0, 255, (40, 48))
    for t in range(3):
        pairs.append((np.roll(base, t, axis=1), np.roll(base, t + 1, axis=1)))
    params = {"display": False}
    streamed = list(estimate_flow_stream(pairs, "hs-brightness", params, max_in_flight=2))
    assert len(streamed) == 3
    for (im1, im2), uv_s in zip(pairs, streamed):
        uv = np.asarray(estimate_flow(im1, im2, "hs-brightness", params))
        np.testing.assert_array_equal(uv_s, uv)


def test_video_sequence(rng):
    from optical_flow_tpu.parallel.video import estimate_flow_video

    T, H, W = 4, 40, 48
    base = rng.uniform(0, 255, (H, W))
    frames = np.stack([np.roll(base, t, axis=1) for t in range(T)])
    uv = np.asarray(estimate_flow_video(frames, "hs-brightness"))
    assert uv.shape == (T - 1, H, W, 2)
    np.testing.assert_allclose(uv[:, 8:-8, 8:-8, 0].mean(axis=(1, 2)), 1.0, atol=0.05)
