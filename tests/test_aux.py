"""Auxiliary subsystems: checkpoint/resume, profiling, batched pipeline glue."""
import os

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.config import load_of_method
from optical_flow_tpu.utils.checkpoint import FlowCheckpointer
from optical_flow_tpu.utils.profiling import StageTimer


def test_checkpointer_roundtrip(tmp_path, rng):
    ckpt = FlowCheckpointer(str(tmp_path))
    uv = rng.standard_normal((12, 14, 2)).astype(np.float32)
    ckpt.save(1, 3, uv)
    stage, level, back = ckpt.latest()
    assert (stage, level) == (1, 3)
    np.testing.assert_array_equal(back, uv)


def test_checkpoint_during_compute_flow(tmp_path, rng):
    im = rng.uniform(0, 255, (40, 44))
    im2 = np.roll(im, 1, axis=1)
    ope = load_of_method("hs-brightness")
    ope.median_filter_size = None  # no post-loop filtering after the last checkpoint
    ope.checkpoint = FlowCheckpointer(str(tmp_path))
    ope.images = jnp.stack([jnp.asarray(im), jnp.asarray(im2)], 2)
    uv = np.asarray(ope.compute_flow())
    stage, level, saved = ope.checkpoint.latest()
    assert level == 0  # finest level was checkpointed last
    np.testing.assert_allclose(saved, uv, atol=1e-5)


def test_warmup_precompiles_level_programs(rng):
    """warmup_classic_nl pre-compiles every program of a per-level run: a
    subsequent compute_flow (fuse=False path on CPU) reuses the jit caches
    and produces the normal result."""
    from optical_flow_tpu.utils.warmup import warmup_classic_nl

    H, W = 32, 36
    ope = load_of_method("classic+nl-fast")
    ope.display = False
    ope.color_images = None  # grayscale run: plain-median fallback
    warmup_classic_nl(ope, (H, W), color=False, max_workers=4)

    im = rng.uniform(0, 255, (H, W))
    ope.images = jnp.stack([jnp.asarray(im), jnp.asarray(np.roll(im, 1, axis=1))], 2)
    uv = np.asarray(ope.compute_flow())
    assert uv.shape == (H, W, 2)
    assert np.isfinite(uv).all()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    totals = t.totals()
    assert set(totals) == {"a", "b"}
    assert "a" in t.report()
