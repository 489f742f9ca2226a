#!/usr/bin/env python
"""4K (3840x2160) single-chip profile: end-to-end + per-component breakdown.

VERDICT r1 item 9: where do the 4K seconds go?  Times the fused and
per-level classic+nl-fast paths end to end, then isolates the finest-level
hot components (bicubic warp read, weighted median, occlusion, one IRLS
linearization+solve) as individually-synchronized jitted calls on real 4K
data.  Emits one JSON line per measurement to stdout; progress on stderr.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(name, seconds, **kw):
    print(
        json.dumps({"metric": name, "value": round(seconds, 4), "unit": "s", **kw}),
        flush=True,
    )


def timed(fn, *args, reps=2, warm=1):
    import jax

    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from optical_flow_tpu.interface import estimate_flow
    from optical_flow_tpu.io.flo import read_flow_file

    log("devices:", jax.devices())
    H, W = 2160, 3840
    im1s, im2s, _, _ = read_flow_file("RubberWhale", 10)
    reps = (-(-H // im1s.shape[0]), -(-W // im1s.shape[1]), 1)
    im1 = np.tile(im1s, reps)[:H, :W]
    im2 = np.tile(im2s, reps)[:H, :W]

    # ---- end to end ----
    for name, params in [
        ("per-level", {"display": False, "solver": "pcg", "fuse": False}),
        ("fused", {"display": False, "solver": "pcg"}),
    ]:
        t0 = time.time()
        uv = np.asarray(estimate_flow(im1, im2, "classic+nl-fast", params))
        log(f"4K {name} warmup (incl. compile): {time.time() - t0:.1f}s")
        best = float("inf")
        for i in range(2):
            t0 = time.time()
            uv = np.asarray(estimate_flow(im1, im2, "classic+nl-fast", params))
            dt = time.time() - t0
            best = min(best, dt)
            log(f"4K {name} run {i}: {dt:.2f}s")
        emit(f"classic+nl-fast 4K {name} s/frame", best,
             finite=bool(np.isfinite(uv).all()))

    # ---- finest-level component isolation ----
    from optical_flow_tpu.config import load_of_method
    from optical_flow_tpu.interface import _preprocess_color_pair
    from optical_flow_tpu.methods.ba import _preprocess_traced, _blended_solve
    from optical_flow_tpu.ops.derivatives import precompute_warp, warp_deriv
    from optical_flow_tpu.ops.occlusion import detect_occlusion
    from optical_flow_tpu.ops.wmedian import denoise_color_weighted_medfilt2

    ope = load_of_method("classic+nl-fast")
    ope.parse_input_parameter({"solver": "pcg"})
    cfg = ope._nl_cfg(use_color=True, max_linear=1)
    irls = cfg.irls

    rgb1 = np.tile(np.asarray(im1s)[..., None], (1, 1, 3))
    images_s, lab1 = _preprocess_color_pair(
        jnp.asarray(np.tile(rgb1, reps)[:H, :W], jnp.float32),
        jnp.asarray(np.tile(rgb1, reps)[:H, :W], jnp.float32),
    )
    images = jnp.stack([jnp.asarray(im1, jnp.float32), jnp.asarray(im2, jnp.float32)], -1)
    proc = jax.jit(lambda x: _preprocess_traced("texture", x, 0.95))(images)
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-1, 1, (H, W, 2)), jnp.float32)

    df = np.array(irls.deriv_filter)
    pre = jax.block_until_ready(
        jax.jit(lambda im: precompute_warp(im, irls.interp, df, irls.blend))(proc)
    )
    t = timed(jax.jit(lambda p, f: warp_deriv(p, f)), pre, uv)
    emit("4K finest-level warp+derivs (bicubic) s", t)

    It, Ix, Iy = jax.jit(lambda p, f: warp_deriv(p, f))(pre, uv)
    t = timed(
        jax.jit(
            lambda u, t_, x_, y_, a: _blended_solve(irls, u, jnp.zeros_like(u), t_, x_, y_, a)
        ),
        uv, It, Ix, Iy, jnp.asarray(0.0, jnp.float32),
    )
    emit("4K finest-level IRLS+PCG solve s", t)

    t = timed(jax.jit(lambda u, im: detect_occlusion(u, im)), uv, proc)
    emit("4K finest-level occlusion s", t)

    occ = jax.jit(lambda u, im: detect_occlusion(u, im))(uv, proc)
    wm = jax.jit(
        lambda u, c, o: denoise_color_weighted_medfilt2(
            u, c, o, cfg.area_hsz, irls.median_filter_size, cfg.sigma_i, cfg.full_version
        )
    )
    t = timed(wm, uv, lab1, occ)
    emit("4K finest-level color-weighted median s", t)


if __name__ == "__main__":
    main()
