"""Video-sequence flow estimation: consecutive-pair batching.

The production serving shape: a (T, H, W) frame sequence becomes T-1
consecutive pairs processed data-parallel (one vmapped program over the
batch, batch axis shardable over the mesh).  The reference can only loop
single pairs in one process.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from optical_flow_tpu.parallel.batch import estimate_flow_batched


def estimate_flow_video(frames, method: str = "classic+nl-fast", mesh=None, params=None):
    """Flow for every consecutive pair of a (T, H, W) grayscale sequence.

    Returns (T-1, H, W, 2).
    """
    frames = jnp.asarray(frames)
    if frames.ndim != 3:
        raise ValueError(f"expected (T, H, W) grayscale frames, got {frames.shape}")
    pairs = jnp.stack([frames[:-1], frames[1:]], axis=-1)  # (T-1, H, W, 2)
    return estimate_flow_batched(pairs, method, mesh=mesh, params=params)
