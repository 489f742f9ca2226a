"""Pallas TPU kernel: VMEM-resident ROF primal-dual iteration.

The XLA formulation (ops/rof.py) is a ``fori_loop`` whose dual state
``p`` round-trips HBM every iteration (XLA fuses the ops *within* an
iteration, but the loop carry lives in HBM).  At 100 iterations over a
(H, W) image that is ~100 x 3 arrays of HBM traffic for ~zero FLOPs —
pure bandwidth waste.

This kernel keeps the image and both dual fields in VMEM for the entire
iteration loop: one HBM read of the image, one HBM write of the structure
output.  Applicable whenever 3 x H x W x 4 bytes fits in VMEM (~16 MB/core);
the caller falls back to the XLA path otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_left_pad0(x):
    """x[:, j+1] with zero at the last column."""
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def _shift_right_pad0(x):
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _shift_up_pad0(x):
    return jnp.concatenate([x[1:, :], jnp.zeros_like(x[:1, :])], axis=0)


def _shift_down_pad0(x):
    return jnp.concatenate([jnp.zeros_like(x[:1, :]), x[:-1, :]], axis=0)


def _divergence(px, py):
    """Backward-difference divergence with zero boundary (rof.py:104-111)."""
    return (px - _shift_right_pad0(px)) + (py - _shift_down_pad0(py))


def _rof_kernel(im_ref, out_ref, px_ref, py_ref, *, theta, n_iters):
    delta = 1.0 / (4.0 * theta)
    im = im_ref[:]
    px_ref[:] = jnp.zeros_like(im)
    py_ref[:] = jnp.zeros_like(im)
    H, W = im.shape
    # far-boundary zero masks (Mosaic has no scatter; iota compare is free)
    mask_x = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) < W - 1).astype(im.dtype)
    mask_y = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) < H - 1).astype(im.dtype)

    def body(_, carry):
        px = px_ref[:]
        py = py_ref[:]
        u = im + theta * _divergence(px, py)
        # forward-difference gradient, zero at far boundary
        gx = (_shift_left_pad0(u) - u) * mask_x
        gy = (_shift_up_pad0(u) - u) * mask_y
        px = px + delta * gx
        py = py + delta * gy
        norm = jnp.maximum(jnp.sqrt(px * px + py * py), 1.0)
        px_ref[:] = px / norm
        py_ref[:] = py / norm
        return carry

    jax.lax.fori_loop(0, n_iters, body, 0)
    out_ref[:] = im + theta * _divergence(px_ref[:], py_ref[:])


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rof_structure_2d_pallas(im, theta: float = 1.0 / 8, n_iters: int = 100, interpret: bool = False):
    """Structure component of a single-channel image, fully VMEM-resident."""
    H, W = im.shape
    kernel = functools.partial(_rof_kernel, theta=theta, n_iters=n_iters)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), im.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, W), im.dtype),
            pltpu.VMEM((H, W), im.dtype),
        ],
        interpret=interpret,
    )(im)


def rof_vmem_ok(shape, dtype_bytes: int = 4, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """True when image + two dual fields (+ slack) fit in VMEM."""
    H, W = shape
    return 4 * H * W * dtype_bytes <= budget_bytes
