"""High-level interface: ``estimate_flow(im1, im2, method, params)``.

Reference: ``interface.py:11-71``.  Handles grayscale conversion (MATLAB
uint8-quantized), Lab color for the non-local term (channels rescaled to
[0, 255]), parameter overrides, zero init, and dispatch.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from optical_flow_tpu.config import load_of_method
from optical_flow_tpu.utils.compat import rgb2gray, rgb2lab, scale_image


def estimate_flow(im1, im2, method: str = "classic+nl-fast", params=None):
    """Estimate optical flow between two images.

    Args:
        im1, im2: (H, W) grayscale or (H, W, 3) RGB images (float or uint8).
        method: preset name (see :func:`load_of_method`).
        params: optional dict (or MATLAB-style k/v list) of overrides.

    Returns:
        uv: (H, W, 2) flow; uv[..., 0] horizontal, uv[..., 1] vertical.
    """
    im1 = np.asarray(im1, dtype=float)
    im2 = np.asarray(im2, dtype=float)

    ope = load_of_method(method)
    if params is not None:
        ope.parse_input_parameter(params)

    if im1.ndim == 3 and im1.shape[2] >= 3:
        gray1 = rgb2gray(jnp.asarray(im1))
        gray2 = rgb2gray(jnp.asarray(im2))
        ope.images = jnp.stack([gray1, gray2], axis=2)
    elif im1.ndim == 2:
        ope.images = jnp.stack([jnp.asarray(im1), jnp.asarray(im2)], axis=2)
    else:
        ope.images = jnp.concatenate([jnp.asarray(im1), jnp.asarray(im2)], axis=2)

    # color for the weighted non-local term (interface.py:54-64)
    if ope.color_images is not None:
        if im1.ndim == 3 and im1.shape[2] >= 3:
            lab1 = rgb2lab(jnp.asarray(im1))
            lab1 = jnp.stack(
                [scale_image(lab1[:, :, j], 0, 255) for j in range(lab1.shape[2])],
                axis=2,
            )
        else:
            lab1 = jnp.asarray(im1)
        ope.color_images = lab1

    H, W = im1.shape[:2]
    init = jnp.zeros((H, W, 2))
    return ope.compute_flow(init)
