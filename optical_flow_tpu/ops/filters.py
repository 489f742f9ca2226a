"""Small-stencil correlation filters as fused shift-accumulate programs.

The reference leans on ``scipy.ndimage.correlate`` (C loops over HBM-resident
arrays).  On TPU a k×k correlation with a *constant* kernel is best expressed
as a sum of shifted multiplies over a padded array: XLA fuses the whole thing
into one VPU loop, and there is no conv layout/IM2COL overhead for the tiny
single-channel images involved.  Kernels are numpy constants at trace time, so
zero taps are skipped for free.

Boundary names follow scipy.ndimage: ``reflect`` (edge value included —
numpy ``symmetric``) and ``nearest`` (numpy ``edge``), matching the use sites
in the reference (``derivatives.py``, ``pyramid.py``, ``image_processing.py``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PAD_MODE = {
    "reflect": "symmetric",  # scipy 'reflect'  == numpy 'symmetric'
    "nearest": "edge",  # scipy 'nearest'  == numpy 'edge'
    "mirror": "reflect",  # scipy 'mirror'   == numpy 'reflect'
    "constant": "constant",
}


def correlate2d(im, kernel, boundary: str = "reflect"):
    """2-D correlation with a constant kernel, scipy.ndimage semantics.

    ``im`` is (H, W); ``kernel`` a numpy array (any 2-D shape, possibly 1×k
    or k×1).  The kernel origin matches ``scipy.ndimage.correlate`` —
    centered, with ties toward the upper-left for even sizes.
    """
    kernel = np.atleast_2d(np.asarray(kernel))
    kh, kw = kernel.shape
    # scipy.ndimage origin: center at (kh//2, kw//2)
    cy, cx = kh // 2, kw // 2
    pad_t, pad_b = cy, kh - 1 - cy
    pad_l, pad_r = cx, kw - 1 - cx
    padded = jnp.pad(im, ((pad_t, pad_b), (pad_l, pad_r)), mode=_PAD_MODE[boundary])
    H, W = im.shape
    out = jnp.zeros_like(im)
    for dy in range(kh):
        for dx in range(kw):
            # python-float weight: weakly typed, never promotes f32 inputs
            w = float(kernel[dy, dx])
            if w == 0.0:
                continue
            out = out + w * padded[dy : dy + H, dx : dx + W]
    return out


def correlate2d_multi(im, kernel, boundary: str = "reflect"):
    """Channel-wise :func:`correlate2d` for (H, W) or (H, W, C) inputs."""
    if im.ndim == 2:
        return correlate2d(im, kernel, boundary)
    chans = [correlate2d(im[:, :, c], kernel, boundary) for c in range(im.shape[2])]
    return jnp.stack(chans, axis=2)


def median_filter2d(im, size, boundary: str = "reflect"):
    """Median filter with odd window ``size`` (int or (h, w)).

    Equivalent to ``scipy.ndimage.median_filter(im, size, mode='reflect')``
    for odd sizes: build the k² shifted views, sort along the window axis,
    take the middle element.  The sort runs on-chip over a (H, W, k²)
    stack — no data-dependent control flow.
    """
    if isinstance(size, (tuple, list, np.ndarray)):
        kh, kw = int(size[0]), int(size[1])
    else:
        kh = kw = int(size)
    cy, cx = kh // 2, kw // 2
    padded = jnp.pad(im, ((cy, kh - 1 - cy), (cx, kw - 1 - cx)), mode=_PAD_MODE[boundary])
    H, W = im.shape
    views = [
        padded[dy : dy + H, dx : dx + W] for dy in range(kh) for dx in range(kw)
    ]
    stack = jnp.stack(views, axis=-1)
    n = kh * kw
    sorted_stack = jnp.sort(stack, axis=-1)
    # rank n//2 matches scipy.ndimage.median_filter for odd and even sizes
    return sorted_stack[..., n // 2]
