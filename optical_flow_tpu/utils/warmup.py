"""Parallel compile warm-up.

Every (config, shape) level program compiles independently, and the
remote AOT compile service processes concurrent requests in parallel —
so firing all of a flow's level programs from a thread pool cuts cold-start
wall time several-fold.  jit caches are thread-safe; each thread triggers
compilation of a distinct program.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _level_schedule(ope, sz):
    """[(cfg, image_hw, uv_hw)] for every level call of a Classic+NL flow."""
    from optical_flow_tpu.ops.pyramid import auto_pyramid_levels, pyramid_shapes

    levels = auto_pyramid_levels(sz, ope.pyramid_spacing) if ope.auto_level else ope.pyramid_levels
    shapes0 = pyramid_shapes(sz, levels, 1.0 / ope.pyramid_spacing)
    shapes1 = pyramid_shapes(
        sz, ope.gnc_pyramid_levels, 1.0 / ope.gnc_pyramid_spacing
    )
    calls = []
    uv_shape = sz
    for ignc in range(ope.gnc_iters):
        shapes = shapes0 if ignc == 0 else shapes1
        cfg = ope._nl_cfg(
            use_color=ope.color_images is not None,
            max_linear=1 if ignc == 0 else None,
        )
        for level in range(len(shapes) - 1, -1, -1):
            calls.append((cfg, shapes[level], uv_shape))
            uv_shape = shapes[level]
    return calls, levels


def warmup_classic_nl(ope, sz: Tuple[int, int], color: bool = True, max_workers: int = 8):
    """Pre-compile every program a Classic+NL ``compute_flow`` will invoke.

    ``ope`` must be configured exactly as it will be used (solver, iters,
    penalties, color or not); ``sz`` is the input image size.
    """
    from optical_flow_tpu.methods.ba import irls_prepare
    from optical_flow_tpu.methods.classic_nl import classic_nl_level_resampled
    from optical_flow_tpu.ops.pyramid import pyramid_pair

    if color and ope.color_images is None:
        ope.color_images = np.ones((1, 1, 3))
    if not color:
        ope.color_images = None

    calls, levels = _level_schedule(ope, sz)
    rng = np.random.default_rng(0)

    def fire(call):
        cfg, img_hw, uv_hw = call
        images = jnp.asarray(rng.uniform(0, 255, (*img_hw, 2)), ope.dtype)
        guide = (
            jnp.asarray(rng.uniform(0, 255, (*img_hw, 3)), ope.dtype)
            if color
            else jnp.zeros((1, 1), dtype=ope.dtype)
        )
        uv = jnp.zeros((*uv_hw, 2), ope.dtype)
        out = classic_nl_level_resampled(cfg, images, guide, uv, jnp.asarray(0.5, ope.dtype))
        jax.block_until_ready(out)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(fire, c) for c in calls]
        # also warm the prepare/pyramid/interface programs concurrently
        if color:
            from optical_flow_tpu.interface import _preprocess_color_pair

            c1 = jnp.asarray(rng.uniform(0, 255, (*sz, 3)), ope.dtype)
            futures.append(
                pool.submit(lambda: jax.block_until_ready(_preprocess_color_pair(c1, c1)))
            )
        images = jnp.asarray(rng.uniform(0, 255, (*sz, 2)), ope.dtype)
        futures.append(
            pool.submit(
                lambda: jax.block_until_ready(
                    irls_prepare(
                        images,
                        ope._preprocess_kind(),
                        float(ope.alp),
                        int(levels),
                        float(ope.pyramid_spacing),
                        (int(ope.gnc_pyramid_levels), float(ope.gnc_pyramid_spacing)),
                    )
                )
            )
        )
        if color:
            guide_full = jnp.asarray(rng.uniform(0, 255, (*sz, 3)), ope.dtype)
            futures.append(
                pool.submit(
                    lambda: jax.block_until_ready(
                        pyramid_pair(
                            guide_full,
                            int(levels),
                            float(ope.pyramid_spacing),
                            int(ope.gnc_pyramid_levels),
                            float(ope.gnc_pyramid_spacing),
                        )
                    )
                )
            )
        for f in futures:
            f.result()
