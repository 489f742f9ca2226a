"""High-level interface: ``estimate_flow(im1, im2, method, params)``.

Reference: ``interface.py:11-71``.  Handles grayscale conversion (MATLAB
uint8-quantized), Lab color for the non-local term (channels rescaled to
[0, 255]), parameter overrides, zero init, and dispatch.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from optical_flow_tpu.config import load_of_method
from optical_flow_tpu.utils.compat import rgb2gray, rgb2lab, scale_image


@jax.jit
def _preprocess_color_pair(im1, im2):
    """Grayscale pair + [0,255]-scaled Lab guide, as ONE device program."""
    gray1 = rgb2gray(im1)
    gray2 = rgb2gray(im2)
    images = jnp.stack([gray1, gray2], axis=2)
    lab1 = rgb2lab(im1)
    lab1 = jnp.stack(
        [scale_image(lab1[:, :, j], 0, 255) for j in range(lab1.shape[2])], axis=2
    )
    return images, lab1


@jax.jit
def _stack_gray_pair(im1, im2):
    return jnp.stack([im1, im2], axis=2)


def estimate_flow(im1, im2, method: str = "classic+nl-fast", params=None, mesh=None):
    """Estimate optical flow between two images.

    Args:
        im1, im2: (H, W) grayscale or (H, W, 3) RGB images (float or uint8).
        method: preset name (see :func:`load_of_method`).
        params: optional dict (or MATLAB-style k/v list) of overrides.
        mesh: optional ``jax.sharding.Mesh`` with a ``'space'`` axis — image
            rows are tiled over it and every feasible pyramid level runs as
            one shard_map program with halo exchange + distributed PCG
            (``parallel/spatial.py``).  ``params['spatial_halo']`` bounds the
            per-level warp displacement handled exactly at shard boundaries.

    Returns:
        uv: (H, W, 2) flow; uv[..., 0] horizontal, uv[..., 1] vertical.
    """
    im1 = np.asarray(im1, dtype=float)
    im2 = np.asarray(im2, dtype=float)

    ope = load_of_method(method)
    if params is not None:
        ope.parse_input_parameter(params)
    if mesh is not None:
        ope.spatial_mesh = mesh

    lab1 = None
    if im1.ndim == 3 and im1.shape[2] >= 3:
        a1 = jnp.asarray(im1, dtype=ope.dtype)
        a2 = jnp.asarray(im2, dtype=ope.dtype)
        ope.images, lab1 = _preprocess_color_pair(a1, a2)
    elif im1.ndim == 2:
        ope.images = _stack_gray_pair(
            jnp.asarray(im1, dtype=ope.dtype), jnp.asarray(im2, dtype=ope.dtype)
        )
    else:
        ope.images = jnp.concatenate([jnp.asarray(im1), jnp.asarray(im2)], axis=2)

    # color for the weighted non-local term (interface.py:54-64)
    if ope.color_images is not None:
        ope.color_images = lab1 if lab1 is not None else jnp.asarray(im1, dtype=ope.dtype)

    H, W = im1.shape[:2]
    init = jnp.zeros((H, W, 2))
    return ope.compute_flow(init)
