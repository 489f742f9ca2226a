#!/usr/bin/env python
"""4K stage profile: where does the time go at 3840x2160?

Times each pipeline stage of classic+nl-fast at the finest (full-res)
pyramid level — the level that dominates end-to-end wall time — plus the
preprocessing / pyramid build, and the end-to-end flow.  Each stage is its
own jitted program, warmed once and timed over `--reps` repeats with device
synchronization.

Accounting: at 4K, classic+nl-fast runs its finest level in both GNC
stages (3 warp iterations each, max_linear=1), so e2e wall time should be
roughly  preprocess + pyramids + 6 x (warp_deriv + solve + occlusion +
wmedian) at full res  + the coarser-level tail.

    python benchmarks/profile4k.py [--reps 3] [--fused]

Writes benchmarks/results_4k_profile.json and prints a table to stderr;
stdout stays clean (one JSON line).
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
# executable cache: the fused 4K monolith routes through utils/aotcache.py,
# so a warm process skips the multi-minute remote AOT compile entirely
os.environ.setdefault("OFTPU_AOT_CACHE", os.path.join(REPO, ".aot_cache"))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """Force execution to completion and return `out`.

    Over the axon tunnel `jax.block_until_ready` returns at ENQUEUE, not at
    completion (measured: 53 ms block vs 5.4 s actual compute on a 20-matmul
    program), so the only reliable sync is fetching data to host.  Fetch one
    element of the last output leaf: the slice depends on the whole program
    having executed, and the host transfer is 4 bytes, not the full 4K array.
    """
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    float(jnp.ravel(leaves[-1])[0].astype(jnp.float32))
    return out


# degraded-worker telemetry: per-measurement trial ratios, dumped into the
# artifact so a reviewer can tell a sick-worker window from a real number
# (a degraded worker stretches individual windows multi-x while the best
# trial stays at the true cost — CLAUDE.md / DESIGN section 8)
_HEALTH: dict = {}


def _record_health(name, trials):
    best = min(trials)
    _HEALTH[str(name)] = {
        "trials_s": [round(t, 4) for t in trials],
        "trial0_over_best": round(trials[0] / max(best, 1e-9), 2),
    }


def timed(fn, *args, reps=3, name=None, static_key=None):
    """Jit `fn` with a scalar checksum folded into the program; warm once,
    then best-of-reps wall time, synced by fetching the 4-byte checksum.

    The checksum lives INSIDE the jitted program so the timed region contains
    zero eager dispatches (each eager op over the tunnel costs ~0.4 s).

    When ``name`` is given the warm-up call routes through the persistent
    executable cache (utils/aotcache.py) so repeat profiling runs skip the
    stage compiles; ``static_key`` must pin whatever configuration the
    closure captures beyond the arg avals (solver, shape, ...)."""
    import jax
    import jax.numpy as jnp

    def with_checksum(*a):
        out = fn(*a)
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return out, jnp.ravel(leaves[-1])[0].astype(jnp.float32)

    cfn = jax.jit(with_checksum)
    if name is not None:
        from optical_flow_tpu.utils.aotcache import cached_call

        # reps route through cached_call too: after the warm-up populates
        # the in-process table, each call is a dict lookup + comp(*args) —
        # the plain-jit path would recompile what the cache already holds
        call = lambda: cached_call(cfn, f"profile4k:{name}", static_key, args, args)
    else:
        call = lambda: cfn(*args)
    out, chk = call()
    float(chk)
    trials = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, chk = call()
        float(chk)
        trials.append(time.perf_counter() - t0)
    _record_health(name or getattr(fn, "__name__", "?"), trials)
    return min(trials), out


def timed_host(fn, *args, reps=3):
    """Like `timed` for host-orchestrated pipelines (not jittable as one
    program): sync via an eager one-element fetch.  The ~0.5 s eager-dispatch
    overhead is fine for the multi-second end-to-end measurements."""
    out = _sync(fn(*args))
    trials = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        trials.append(time.perf_counter() - t0)
    _record_health(getattr(fn, "__name__", "e2e"), trials)
    return min(trials), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--fused", action="store_true", help="also time the fused monolith e2e")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument(
        "--stage2-detail", action="store_true",
        help="decompose the stage-2 coarse level (1728x3072 at 4K) into its"
        " components with per-component efficiency vs the area-scaled"
        " finest-level (roofline-audited) kernels",
    )
    ap.add_argument(
        "--solver", default="pcg",
        help="pcg (default; what bench.py runs — identical accuracy, and at 4K"
        " 2.5x faster than the tight-CG 'backslash' mapping) or backslash",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from optical_flow_tpu.config import load_of_method
    from optical_flow_tpu.methods.ba import _blended_solve, irls_prepare
    from optical_flow_tpu.ops.derivatives import precompute_warp, warp_deriv
    from optical_flow_tpu.ops.occlusion import detect_occlusion
    from optical_flow_tpu.ops.pyramid import auto_pyramid_levels
    from optical_flow_tpu.ops.wmedian import denoise_color_weighted_medfilt2

    log("devices:", jax.devices())
    H, W = args.height, args.width
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (H, W)), 1.5).astype(np.float32)
    im2 = np.roll(base, 2, axis=1)
    images = jnp.stack([jnp.asarray(base), jnp.asarray(im2)], 2)

    ope = load_of_method("classic+nl-fast")
    ope.display = False
    ope.solver = args.solver
    cfg = ope._nl_cfg(use_color=False, max_linear=1)
    irls = cfg.irls
    levels = auto_pyramid_levels((H, W), ope.pyramid_spacing)
    log(f"profiling {W}x{H}, pyramid levels={levels}, "
        f"warp_iters={irls.max_iters} x gnc_stages={ope.gnc_iters}")

    stages = {}
    sk = (H, W, args.solver)  # static config the stage closures capture

    # --- preprocessing: ROF structure-texture + both texture pyramids ----
    prep = jax.jit(
        lambda im: irls_prepare(
            im, ope._preprocess_kind(), float(ope.alp), levels,
            float(ope.pyramid_spacing),
            (int(ope.gnc_pyramid_levels), float(ope.gnc_pyramid_spacing)),
        )
    )
    dt, (pyr, gnc_pyr) = timed(prep, images, reps=args.reps, name="rof+pyramids", static_key=sk)
    stages["rof+pyramids"] = dt
    proc = pyr[0]

    # --- finest-level components (what the warp loop runs 6x at full res)
    uv = jnp.zeros((H, W, 2), dtype=jnp.float32)

    from optical_flow_tpu.ops.derivatives import WarpPrecompute

    # WarpPrecompute carries static leaves (method str, blend float); only the
    # array fields may cross the jit boundary.
    def pre_arrays(im):
        p = precompute_warp(im, irls.interp, np.array(irls.deriv_filter), irls.blend)
        return (p.im1, p.I1x, p.I1y, p.warp_tables, p.hermite_tables)

    dt, arrs = timed(jax.jit(pre_arrays), proc, reps=args.reps, name="precompute", static_key=sk)
    stages["precompute_warp (spline prefilter)"] = dt

    # realistic sub-pixel flow so the gather hits the sweep path like a real run
    uv_live = uv + 0.3 * jnp.sin(jnp.arange(H * W * 2, dtype=jnp.float32).reshape(H, W, 2))

    def wd(arrs, f):
        p = WarpPrecompute(irls.interp, float(irls.blend), *arrs)
        return warp_deriv(p, f)

    wd_fn = jax.jit(wd)
    dt, (It, Ix, Iy) = timed(wd_fn, arrs, uv_live, reps=args.reps, name="warp_deriv", static_key=sk)
    stages["warp_deriv (bicubic warp gathers)"] = dt

    solve_fn = jax.jit(
        lambda uv, duv, It, Ix, Iy, a: _blended_solve(irls, uv, duv, It, Ix, Iy, a)
    )
    z = jnp.zeros_like(uv)
    dt, duv = timed(solve_fn, uv_live, z, It, Ix, Iy, jnp.float32(0.5), reps=args.reps, name="solve", static_key=sk)
    stages["irls system + PCG solve"] = dt

    occ_fn = jax.jit(lambda f, im: detect_occlusion(f, im))
    dt, occ = timed(occ_fn, uv_live, proc, reps=args.reps, name="occlusion", static_key=sk)
    stages["occlusion"] = dt

    wm_fn = jax.jit(
        lambda f, o: denoise_color_weighted_medfilt2(
            f, None, o, cfg.area_hsz, irls.median_filter_size, cfg.sigma_i,
            cfg.full_version,
        )
    )
    dt, _ = timed(wm_fn, uv_live, occ, reps=args.reps, name="wmedian", static_key=sk)
    stages["weighted median"] = dt

    per_iter = (
        stages["warp_deriv (bicubic warp gathers)"]
        + stages["irls system + PCG solve"]
        + stages["occlusion"]
        + stages["weighted median"]
    )
    finest_iters = 2 * irls.max_iters  # finest level runs in both GNC stages

    # --- the coarse tail (the r2 accounting gap): stage-1 levels 1..L-1
    # as ONE jitted program (resamples included), and the stage-2 coarse
    # level (spacing 1.25 => ~0.64x the full-res area — NOT small) --------
    from optical_flow_tpu.methods.classic_nl import classic_nl_level_step
    from optical_flow_tpu.ops.resample import resample_flow

    dummy = jnp.zeros((1, 1), jnp.float32)

    def stage1_tail(pyr_arrays, alpha):
        f = jnp.zeros((*pyr_arrays[-1].shape[:2], 2), jnp.float32)
        for lvl in range(levels - 1, 0, -1):
            f = resample_flow(f, pyr_arrays[lvl].shape[:2])
            f = classic_nl_level_step(cfg, pyr_arrays[lvl], dummy, f, alpha)
        # plus the final resample up to full res that precedes the finest level
        return resample_flow(f, pyr_arrays[0].shape[:2])

    dt, uv_tail = timed(stage1_tail, tuple(pyr), jnp.float32(1.0), reps=args.reps, name="stage1_tail", static_key=sk)
    stages["stage1 coarse tail (levels 1..%d + resamples)" % (levels - 1)] = dt

    def stage2_coarse(gp, f, alpha):
        f = resample_flow(f, gp[1].shape[:2])
        f = classic_nl_level_step(cfg, gp[1], dummy, f, alpha)
        return resample_flow(f, gp[0].shape[:2])

    dt, _ = timed(stage2_coarse, tuple(gnc_pyr), uv_tail, jnp.float32(0.0), reps=args.reps, name="stage2_coarse", static_key=sk)
    stages["stage2 coarse level (%dx%d + resamples)" % gnc_pyr[1].shape[:2]] = dt

    results_stage2 = None
    # --- stage-2 component decomposition + roofline accounting -----------
    # The stage-2 coarse level is the same kernels as the finest level at
    # 1/spacing^2 = 0.64x the pixel count: if each component's time is
    # ~0.64x its finest-level time, the level runs at the SAME per-pixel
    # efficiency as the roofline-audited full-res kernels (wmedian: VPU
    # load roofline, closed; warp: row-blocked local sweep; CG: HBM
    # working-set floor) — i.e. its cost is ALGORITHM parity (3 warp iters
    # of a 2nd GNC stage, ba.py:89-109), not kernel waste.
    if args.stage2_detail:
        H2, W2 = gnc_pyr[1].shape[:2]
        proc2 = gnc_pyr[1]
        area = (H2 * W2) / (H * W)
        s2 = {}
        dt, arrs2 = timed(jax.jit(pre_arrays), proc2, reps=args.reps, name="s2_precompute", static_key=sk)
        s2["precompute_warp"] = dt
        uv2 = resample_flow(uv_tail, (H2, W2))
        uv2_live = uv2 + 0.3 * jnp.sin(
            jnp.arange(H2 * W2 * 2, dtype=jnp.float32).reshape(H2, W2, 2)
        )
        dt, (It2, Ix2, Iy2) = timed(wd_fn, arrs2, uv2_live, reps=args.reps, name="s2_warp_deriv", static_key=sk)
        s2["warp_deriv"] = dt
        z2 = jnp.zeros_like(uv2)
        dt, _ = timed(
            solve_fn, uv2_live, z2, It2, Ix2, Iy2, jnp.float32(0.0), reps=args.reps,
            name="s2_solve", static_key=sk,
        )
        s2["irls+solve"] = dt
        dt, occ2 = timed(occ_fn, uv2_live, proc2, reps=args.reps, name="s2_occlusion", static_key=sk)
        s2["occlusion"] = dt
        dt, _ = timed(wm_fn, uv2_live, occ2, reps=args.reps, name="s2_wmedian", static_key=sk)
        s2["weighted median"] = dt

        from optical_flow_tpu.ops.pallas.cg_kernel import cg_pallas_ok
        from optical_flow_tpu.ops.pallas.wmedian_kernel import wmedian_pallas_ok

        finest_of = {
            "warp_deriv": "warp_deriv (bicubic warp gathers)",
            "irls+solve": "irls system + PCG solve",
            "occlusion": "occlusion",
            "weighted median": "weighted median",
            "precompute_warp": "precompute_warp (spline prefilter)",
        }
        detail = {}
        log(f"\nstage-2 level {W2}x{H2} (area ratio {area:.3f}):")
        for k, v in s2.items():
            fin = stages[finest_of[k]]
            eff = v / (fin * area) if fin > 0 else float("nan")
            detail[k] = {
                "s": round(v, 4),
                "finest_s": round(fin, 4),
                "vs_area_scaled_finest": round(eff, 3),
            }
            log(f"  {k:<18} {v*1000:8.1f} ms   ({eff:.2f}x of area-scaled finest)")
        detail["_kernels_engaged"] = {
            "wmedian_pallas": bool(wmedian_pallas_ok(H2, W2, cfg.area_hsz, 1)),
            "cg_pallas_vmem": bool(cg_pallas_ok(H2, W2)),
            "cg_fallback": "channel-split XLA PCG (solvers/cg.py::pcg_solve_split)",
        }
        results_stage2 = detail

    accounted = (
        stages["rof+pyramids"]
        + 2 * stages["precompute_warp (spline prefilter)"]
        + finest_iters * per_iter
        + stages["stage1 coarse tail (levels 1..%d + resamples)" % (levels - 1)]
        + stages["stage2 coarse level (%dx%d + resamples)" % gnc_pyr[1].shape[:2]]
    )

    # --- end-to-end -------------------------------------------------------
    results = {
        "shape": [H, W],
        "levels": levels,
        "stages_s": {k: round(v, 4) for k, v in stages.items()},
        "per_warp_iter_s": round(per_iter, 4),
        "finest_level_iters": finest_iters,
        "accounted_s": round(accounted, 3),
        "accounting_note": (
            "accounted = rof+pyramids + 2*precompute + finest_iters*per_iter"
            " + stage1 coarse tail + stage2 coarse level; remaining gap vs"
            " e2e is per-dispatch tunnel latency (per-level path only)"
        ),
    }
    if results_stage2 is not None:
        results["stage2_detail"] = results_stage2

    if not args.skip_e2e:
        ope2 = load_of_method("classic+nl-fast")
        ope2.display = False
        ope2.solver = args.solver
        ope2.fuse = False  # per-level programs: comparable to the r1 number
        ope2.images = images
        dt, _ = timed_host(lambda: ope2.compute_flow(), reps=max(1, args.reps - 1))
        results["e2e_perlevel_s"] = round(dt, 3)
        log(f"e2e (per-level): {dt:.2f}s  accounted: {accounted:.2f}s")

    if args.fused:
        ope3 = load_of_method("classic+nl-fast")
        ope3.display = False
        ope3.solver = args.solver
        ope3.fuse = True
        ope3.images = images
        dt, _ = timed_host(lambda: ope3.compute_flow(), reps=max(1, args.reps - 1))
        results["e2e_fused_s"] = round(dt, 3)
        log(f"e2e (fused): {dt:.2f}s")

    width = max(len(k) for k in stages)
    for k, v in stages.items():
        log(f"  {k:<{width}}  {v * 1000:9.1f} ms")
    log(f"  {'per warp iter (x' + str(finest_iters) + ' at full res)':<{width}}  {per_iter * 1000:9.1f} ms")

    suspects = {k: h for k, h in _HEALTH.items() if h["trial0_over_best"] > 2.0}
    results["worker_health"] = {
        "per_measurement": _HEALTH,
        "worker_suspect": bool(suspects),
        "suspect_measurements": sorted(suspects),
    }
    out_path = os.path.join(REPO, "benchmarks", "results_4k_profile.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        "metric": f"classic+nl-fast s/frame @{W}x{H}",
        "value": results.get("e2e_perlevel_s", results["accounted_s"]),
        "unit": "s",
        **{k: v for k, v in results.items() if k not in ("stages_s", "worker_health")},
        "worker_suspect": results["worker_health"]["worker_suspect"],
    }))


if __name__ == "__main__":
    main()
