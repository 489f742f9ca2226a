"""Pipeline parallelism across frames (parallel/pipeline.py).

The pipelined stream must reproduce the per-level execution path exactly
(same jitted level programs, same order — only device placement differs),
keep frames in input order, and actually spread stage groups over
distinct devices of the virtual 8-device CPU mesh.
"""
import numpy as np
import jax
import pytest

from optical_flow_tpu.interface import estimate_flow
from optical_flow_tpu.parallel.pipeline import (
    build_pipeline_schedule,
    estimate_flow_pipelined,
)


def _smooth_pair(seed, h, w, rgb=False):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    base = gaussian_filter(rng.uniform(0, 255, shape), 1.5)
    base = 255 * (base - base.min()) / np.ptp(base)
    im2 = np.roll(base, 1, axis=1)
    return base, im2


@pytest.mark.parametrize(
    "method,rgb",
    [
        ("hs-brightness", False),
        ("classic-c-brightness", False),
        ("classic+nl-fast", True),
        ("classic-c-a", False),
    ],
)
def test_pipelined_matches_per_level(method, rgb):
    im1, im2 = _smooth_pair(0, 48, 64, rgb=rgb)
    params = {"display": False, "fuse": False}
    if method == "classic-c-a":
        params["max_iters"] = 4

    ref = np.asarray(estimate_flow(im1, im2, method, dict(params)))
    out = [
        np.asarray(uv)
        for uv in estimate_flow_pipelined([(im1, im2)] * 2, method, dict(params))
    ]
    assert len(out) == 2
    for uv in out:
        # same jitted programs in the same order; only placement differs.
        # per-device executables of identical HLO can still reassociate
        # reductions, so allow float-rounding-scale drift (amplified by CG
        # up to its tolerance scale on the hardest systems)
        np.testing.assert_allclose(uv, ref, atol=5e-3)
        assert np.abs(uv - ref).mean() < 1e-4


def test_pipeline_spreads_stages_over_devices():
    devices = jax.devices()
    assert len(devices) >= 4  # conftest forces the 8-device CPU mesh
    im1, im2 = _smooth_pair(1, 48, 64)

    flows = list(
        estimate_flow_pipelined(
            [(im1, im2)], "hs-brightness", {"display": False}, devices=devices[:4]
        )
    )
    assert len(flows) == 1
    # the final flow must come off the LAST stage's device
    out_dev = list(flows[0].devices())[0]
    assert out_dev in devices[:4]
    assert out_dev != devices[0] or len(devices) == 1


def test_pipeline_schedule_partition_balance():
    from optical_flow_tpu.config import load_of_method
    from optical_flow_tpu.parallel.pipeline import _partition

    ope = load_of_method("classic+nl-fast")
    ope.display = False
    sched = build_pipeline_schedule(ope, (388, 584), use_color=True)
    costs = [s.cost for s in sched.steps]
    groups = _partition(costs, 4)
    assert sum(len(g) for g in groups) == len(costs)
    # contiguity + order
    flat = [i for g in groups for i in g]
    assert flat == list(range(len(costs)))
    # the finest (most expensive) level must not share a group with the
    # whole coarse tail — balance actually did something
    assert len(groups) >= 3
    heaviest = max(costs)
    for g in groups:
        if heaviest in [costs[i] for i in g]:
            assert len(g) <= len(costs) // 2


def test_pipeline_preserves_order_many_frames():
    pairs = []
    for k in range(4):
        im1, im2 = _smooth_pair(k + 10, 40, 48)
        pairs.append((im1, im2))

    outs = [
        np.asarray(uv)
        for uv in estimate_flow_pipelined(
            pairs, "hs-brightness", {"display": False}, depth=2
        )
    ]
    assert len(outs) == 4
    refs = [
        np.asarray(estimate_flow(a, b, "hs-brightness", {"display": False, "fuse": False}))
        for a, b in pairs
    ]
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(got, ref, atol=5e-3)
        assert np.abs(got - ref).mean() < 1e-4
