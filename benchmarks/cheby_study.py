#!/usr/bin/env python
"""Measured study: Chebyshev semi-iteration vs channel-split PCG on real TPU.

The 4K frame is CG-iteration-count bound with 254 ms/frame in dot-product
reduce passes (DESIGN §4a trace table).  Chebyshev's body has ZERO
reductions (solvers/chebyshev.py); this harness measures whether the saved
reduce passes beat the extra iterations the minimax polynomial costs, on
the same systems and the same rtol-equivalent stopping rule:

* to-convergence wall (rtol 1e-3, incl. the Lanczos bounds estimation for
  Chebyshev — the honest end-to-end cost), with iteration counts
* per-iteration cost via the (maxiter hi) − (maxiter lo) difference at
  rtol 1e-30 (no early exit), the CLAUDE.md /tmp-pattern methodology

Writes benchmarks/results_cheby_study.json; one JSON line on stdout.
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


def smooth(seed, shape, scale=255.0):
    from scipy.ndimage import gaussian_filter

    r = np.random.default_rng(seed)
    x = gaussian_filter(r.uniform(0, 1, shape), 1.5, mode="reflect")
    return (scale * (x - x.min()) / max(np.ptp(x), 1e-9)).astype(np.float32)


def build_system(H, W):
    from optical_flow_tpu.ops.derivatives import partial_deriv
    from optical_flow_tpu.ops.stencil import build_irls_system
    from optical_flow_tpu.robust.robust_function import Robust

    im = np.stack([smooth(7, (H, W)), smooth(8, (H, W))], 2)
    uv = 0.2 * np.stack([smooth(9, (H, W), 1.0), smooth(10, (H, W), 1.0)], -1)
    It, Ix, Iy = partial_deriv(im, uv, "cubic")
    rho = Robust("charbonnier", (0.1,))
    return build_irls_system(
        uv, np.zeros_like(uv), np.asarray(It), np.asarray(Ix), np.asarray(Iy),
        (rho, rho), (rho, rho), rho, 2.5,
    )


def timed(fn, *args, reps=3):
    """Checksum-synced best-of-reps (block_until_ready lies over the axon
    tunnel — fold a scalar fetch into the sync, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    def with_checksum(*a):
        out = fn(*a)
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return out, jnp.ravel(leaves[0])[0].astype(jnp.float32)

    cfn = jax.jit(with_checksum)
    out, chk = cfn(*args)
    float(chk)
    trials = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, chk = cfn(*args)
        float(chk)
        trials.append(time.perf_counter() - t0)
    return min(trials), trials, out


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from optical_flow_tpu.ops.stencil import system_apply_split, weighted_laplacian_diag
    from optical_flow_tpu.solvers.cg import _block_jacobi_split, pcg_solve_split
    from optical_flow_tpu.solvers.chebyshev import (
        cheby_solve_split,
        lanczos_bounds_split,
    )

    log("devices:", jax.devices())
    # resumable per size: a wedged remote-compile helper kills the process
    # (measured: broken pipe at the 4K row) — merge into the existing
    # artifact instead of losing completed rows
    out_path = os.path.join(REPO, "benchmarks", "results_cheby_study.json")
    results = {"sizes": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    all_sizes = {"540x960": (540, 960), "1080x1920": (1080, 1920),
                 "2160x3840": (2160, 3840)}
    want = sys.argv[1].split(",") if len(sys.argv) > 1 else list(all_sizes)
    rtol = 1e-3
    K = 16

    for H, W in (all_sizes[k] for k in want):
        log(f"--- {H}x{W} ---")
        sys_ = build_system(H, W)

        # the system rides through jit as an ARGUMENT (closure capture
        # bakes the 9 fields into the HLO as constants — ~300 MB at 4K,
        # which the remote compile helper rejects with HTTP 413)
        def mk(sys_):
            du = sys_.a11 + weighted_laplacian_diag(sys_.wu_h, sys_.wu_v)
            dv = sys_.a22 + weighted_laplacian_diag(sys_.wv_h, sys_.wv_v)
            apply_A = partial(system_apply_split, sys_)
            precond = _block_jacobi_split(du, dv, sys_.a12)
            return du, dv, apply_A, precond

        row = {}

        # bounds (and their cost, amortizable per system)
        def bounds_fn(sys_):
            _, _, apply_A, precond = mk(sys_)
            return lanczos_bounds_split(apply_A, precond, sys_.b_u, sys_.b_v, k=12)

        t_b, trials_b, bounds = timed(bounds_fn, sys_)
        lmin, lmax = float(bounds[0]), float(bounds[1])
        row["lanczos_s"] = round(t_b, 4)
        row["lmin"] = round(lmin, 5)
        row["lmax"] = round(lmax, 5)
        row["kappa"] = round(lmax / max(lmin, 1e-12), 1)
        log(f"bounds [{lmin:.4f}, {lmax:.4f}] kappa {row['kappa']} in {t_b:.3f}s")

        # to-convergence: CG
        def cg_conv(sys_):
            du, dv, apply_A, _ = mk(sys_)
            return pcg_solve_split(
                apply_A, sys_.b_u, sys_.b_v, du, dv, rtol, 600, a12=sys_.a12,
                return_iters=True,
            )

        t_cg, trials_cg, out = timed(cg_conv, sys_)
        cg_iters = int(out[2])
        row["cg_conv_s"] = round(t_cg, 4)
        row["cg_conv_trials_s"] = [round(t, 4) for t in trials_cg]
        row["cg_iters"] = cg_iters
        log(f"CG: {t_cg:.3f}s / {cg_iters} iters")

        # to-convergence: Chebyshev (bounds INSIDE the timed program — the
        # honest per-system cost)
        def ch_conv(sys_):
            du, dv, apply_A, precond = mk(sys_)
            lo, hi = lanczos_bounds_split(apply_A, precond, sys_.b_u, sys_.b_v, k=12)
            return cheby_solve_split(
                apply_A, sys_.b_u, sys_.b_v, du, dv, lo, hi, rtol, 600,
                a12=sys_.a12, check_every=K, return_iters=True,
            )

        t_ch, trials_ch, out = timed(ch_conv, sys_)
        ch_iters = int(out[2])
        row["cheby_conv_s"] = round(t_ch, 4)
        row["cheby_conv_trials_s"] = [round(t, 4) for t in trials_ch]
        row["cheby_iters"] = ch_iters
        log(f"Cheby: {t_ch:.3f}s / {ch_iters} iters (K={K})")

        # residual sanity: both meet the stopping rule
        def relres(sys_, xu, xv):
            _, _, apply_A, _ = mk(sys_)
            yu, yv = apply_A(xu, xv)
            r2 = jnp.sum((sys_.b_u - yu) ** 2) + jnp.sum((sys_.b_v - yv) ** 2)
            b2 = jnp.sum(sys_.b_u**2) + jnp.sum(sys_.b_v**2)
            return jnp.sqrt(r2 / b2)

        row["cheby_relres"] = round(float(jax.jit(relres)(sys_, out[0], out[1])), 6)

        # per-iteration cost (rtol 1e-30: no early exit)
        per_iter = {}
        for name, lo_hi in (("cg", (20, 100)), ("cheby", (32, 96))):
            lo, hi = lo_hi
            if name == "cg":
                def f(sys_, m):
                    du, dv, apply_A, _ = mk(sys_)
                    return pcg_solve_split(
                        apply_A, sys_.b_u, sys_.b_v, du, dv, 1e-30, m,
                        a12=sys_.a12,
                    )
            else:
                def f(sys_, m):
                    du, dv, apply_A, _ = mk(sys_)
                    return cheby_solve_split(
                        apply_A, sys_.b_u, sys_.b_v, du, dv, lmin, lmax,
                        1e-30, m, a12=sys_.a12, check_every=K,
                    )
            t_lo, _, _ = timed(partial(f, m=lo), sys_)
            t_hi, _, _ = timed(partial(f, m=hi), sys_)
            per_iter[name] = (t_hi - t_lo) / (hi - lo)
            log(f"{name} per-iter: {per_iter[name] * 1e3:.3f} ms")
        row["cg_per_iter_ms"] = round(per_iter["cg"] * 1e3, 4)
        row["cheby_per_iter_ms"] = round(per_iter["cheby"] * 1e3, 4)

        row["cheby_speedup_conv"] = round(t_cg / max(t_ch, 1e-9), 3)
        results["sizes"][f"{H}x{W}"] = row
        with open(out_path, "w") as f:  # incremental: survive worker wedges
            json.dump(results, f, indent=1)

    r4k = results["sizes"].get("2160x3840")
    if r4k is not None:  # partial runs (single-size resume) skip the verdict
        results["verdict"] = (
            "ACCEPT" if r4k["cheby_speedup_conv"] > 1.05 else
            ("WASH" if r4k["cheby_speedup_conv"] > 0.95 else "REJECT")
        )
    results["method"] = {
        "stopping": f"||r|| <= {rtol} ||b||, checked every {K} iters (cheby) / every iter (cg)",
        "timing": "checksum-synced best-of-3 jitted walls (block_until_ready lies over axon)",
        "bounds": "12-step Lanczos tridiagonal eigvalsh, widen 1.05 / shrink 0.8",
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"verdict": results.get("verdict"),
                      "4k": results["sizes"].get("2160x3840")}))


if __name__ == "__main__":
    main()
