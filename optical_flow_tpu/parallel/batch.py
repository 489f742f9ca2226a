"""Batched (data-parallel) flow estimation over frame pairs.

The reference processes one pair per process (SURVEY §2); on TPU a batch of
pairs of identical shape runs as one vmapped program, and the batch axis
shards over the ``batch`` mesh axis — XLA's partitioner keeps every pair
on its own device with zero communication.

The per-level programs (``hs_level_step`` / ``ba_level_step`` /
``classic_nl_level_step``) are pure functions of statically-configured
pytrees, so ``jax.vmap`` lifts the *entire* level solve — warping, IRLS,
CG, weighted median — without modification.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from optical_flow_tpu.config import load_of_method
from optical_flow_tpu.methods.classic_nl import ClassicNLOpticalFlow, classic_nl_level_step
from optical_flow_tpu.methods.hs import HSOpticalFlow, hs_level_step
from optical_flow_tpu.methods.ba import BAOpticalFlow, ba_level_step
from optical_flow_tpu.ops.resample import resample_flow
from optical_flow_tpu.ops.rof import structure_texture_decomposition_rof
from optical_flow_tpu.utils.compat import scale_image
from optical_flow_tpu.parallel.mesh import BATCH_AXIS

_vmapped_cache = {}


def _vmapped(fn, n_array_args):
    key = (fn, n_array_args)
    if key not in _vmapped_cache:
        _vmapped_cache[key] = jax.jit(
            jax.vmap(fn, in_axes=(None,) + (0,) * n_array_args),
            static_argnums=(0,),
        )
    return _vmapped_cache[key]


def estimate_flow_batched(images_batch, method: str = "hs-brightness", mesh=None, params=None):
    """Estimate flow for a (B, H, W, 2) batch of frame pairs.

    All pairs share one pyramid schedule; every level runs as a single
    vmapped program.  With ``mesh`` given, the batch axis is sharded over
    its ``batch`` axis (pure data parallelism over ICI-free work).

    Supports the HS / BA / Classic+NL method families (grayscale pairs).
    """
    ope = load_of_method(method)
    if params is not None:
        ope.parse_input_parameter(params)

    images_batch = jnp.asarray(images_batch, dtype=ope.dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        images_batch = jax.device_put(
            images_batch, NamedSharding(mesh, P(BATCH_AXIS))
        )
    B, H, W = images_batch.shape[:3]

    # preprocessing, batched (scale_image normalizes per pair)
    if ope.texture:
        pre = jax.jit(jax.vmap(lambda im: structure_texture_decomposition_rof(im, 1.0 / 8, 100, ope.alp)))
    else:
        pre = jax.jit(jax.vmap(lambda im: scale_image(im, 0, 255)))
    proc = pre(images_batch)

    if ope.auto_level:
        ope.pyramid_levels = ope._auto_pyramid_levels(proc[0])

    # pyramid ops are matmuls/stencils — vmap them directly
    from optical_flow_tpu.ops.pyramid import pyramid_filter, pyramid_shapes
    from optical_flow_tpu.ops.filters import correlate2d_multi
    from optical_flow_tpu.ops.interp import matlab_imresize_bilinear

    def build_batched_pyramid(pb, levels, spacing):
        f = pyramid_filter(spacing)
        shapes = pyramid_shapes(pb.shape[1:3], levels, 1.0 / spacing)
        out = [pb]
        cur = pb
        for lvl in range(1, levels):
            smooth = jax.vmap(lambda im: correlate2d_multi(im, f, "reflect"))(cur)
            cur = jax.vmap(lambda im: matlab_imresize_bilinear(im, shapes[lvl]))(smooth)
            out.append(cur)
        return out

    uv = jnp.zeros((B, H, W, 2), dtype=ope.dtype)
    alpha = 1.0

    if isinstance(ope, HSOpticalFlow):
        cfg = ope._level_cfg()
        pyramid = build_batched_pyramid(proc, ope.pyramid_levels, ope.pyramid_spacing)
        step = _vmapped(hs_level_step.__wrapped__, 2)
        for level in range(ope.pyramid_levels - 1, -1, -1):
            nsz = pyramid[level].shape[1:3]
            uv = jax.vmap(lambda f: resample_flow(f, nsz))(uv)
            uv = step(cfg, pyramid[level], uv)
        return uv

    if isinstance(ope, ClassicNLOpticalFlow):
        color = None  # grayscale batched path: plain-median fallback
        pyramid = build_batched_pyramid(proc, ope.pyramid_levels, ope.pyramid_spacing)
        gnc_pyramid = build_batched_pyramid(proc, ope.gnc_pyramid_levels, ope.gnc_pyramid_spacing)
        step = _vmapped(classic_nl_level_step.__wrapped__, 4)
        for ignc in range(ope.gnc_iters):
            levels, cur = (
                (ope.pyramid_levels, pyramid)
                if ignc == 0
                else (ope.gnc_pyramid_levels, gnc_pyramid)
            )
            cfg = ope._nl_cfg(use_color=False, max_linear=1 if ignc == 0 else None)
            for level in range(levels - 1, -1, -1):
                nsz = cur[level].shape[1:3]
                uv = jax.vmap(lambda f: resample_flow(f, nsz))(uv)
                dummy_color = jnp.zeros((B, 1, 1), dtype=ope.dtype)
                uv = step(cfg, cur[level], dummy_color, uv, jnp.full((B,), alpha, ope.dtype))
            if ope.gnc_iters > 1:
                alpha = max(0.0, min(alpha, 1.0 - (ignc + 1) / (ope.gnc_iters - 1)))
        return uv

    if isinstance(ope, BAOpticalFlow):
        pyramid = build_batched_pyramid(proc, ope.pyramid_levels, ope.pyramid_spacing)
        gnc_pyramid = build_batched_pyramid(proc, ope.gnc_pyramid_levels, ope.gnc_pyramid_spacing)
        step = _vmapped(ba_level_step.__wrapped__, 3)
        for ignc in range(ope.gnc_iters):
            levels, cur = (
                (ope.pyramid_levels, pyramid)
                if ignc == 0
                else (ope.gnc_pyramid_levels, gnc_pyramid)
            )
            cfg = ope._level_cfg(max_linear=1 if ignc == 0 else None)
            for level in range(levels - 1, -1, -1):
                nsz = cur[level].shape[1:3]
                uv = jax.vmap(lambda f: resample_flow(f, nsz))(uv)
                uv = step(cfg, cur[level], uv, jnp.full((B,), alpha, ope.dtype))
            if ope.gnc_iters > 1:
                alpha = max(0.0, min(alpha, 1.0 - (ignc + 1) / (ope.gnc_iters - 1)))
        return uv

    raise ValueError(f"Batched estimation not supported for method '{method}'")
