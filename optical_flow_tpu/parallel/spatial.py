"""End-to-end spatially-sharded Classic+NL estimation (SP/CP over rows).

The pixel grid is the "sequence": image rows are tiled across the ``space``
mesh axis, and a WHOLE pyramid-level solve — Hermite-bicubic warp +
derivatives, robust IRLS system, distributed PCG, occlusion detection,
color-guided weighted median — runs inside one ``shard_map``, exchanging
only halo strips (``ppermute``) and CG inner products (``psum``) over ICI.
This is the capability seam the reference cannot scale past
(``/root/reference/optical_flow/methods/base.py:87-172``: a global spsolve;
SURVEY §2's tiling table).

Exactness contract
------------------
The sharded level step computes the *same function* as the single-device
``classic_nl_level_step`` (up to float reduction order in CG dot products):

* every boundary convention is reproduced at the true image edges via
  :func:`~optical_flow_tpu.parallel.halo.halo_exchange_rows` fill modes
  (symmetric for derivative filters, reflect for the weighted median, edge
  for clamped warp reads);
* when the row count does not divide the mesh, rows are padded at the
  bottom.  The padded rows are masked out of the linear system (their
  coefficients, RHS, and the H-1 coupling edge are zeroed), so CG iterates
  — including the convergence test — are bit-for-bit those of the unpadded
  problem, and boundary-dependent reads (mirror fills for filters and the
  median) are re-synthesized in the pad region each iteration
  (:func:`_fixup_bottom`).

The per-shard warp gather is exact for displacements up to the static
``halo`` radius; beyond that local indices clamp to the halo (the same
graceful degradation as any overlap-and-discard tiling).  Coarse-to-fine
plus the ±1 update clip keeps per-level displacements far below the
default.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from optical_flow_tpu.ops.derivatives import HERMITE_CORNER_SHIFTS, hermite_eval
from optical_flow_tpu.ops.gather import gather_planes
from optical_flow_tpu.ops.stencil import FlowSystem, blend_systems
from optical_flow_tpu.ops.wmedian import wmedfilt_prepadded
from optical_flow_tpu.parallel.halo import halo_exchange_rows
from optical_flow_tpu.parallel.mesh import SPACE_AXIS
from optical_flow_tpu.parallel.dist import (
    sharded_laplacian_apply_local,
    solve_flow_system_local,
)


@dataclasses.dataclass(frozen=True)
class SpatialConfig:
    """Static row-sharding geometry for one pyramid level."""

    axis_name: str
    n: int  # shards along the space axis
    Hs: int  # local rows per shard (includes the pad)
    pad: int  # bottom pad rows (0 when H divides n)
    halo: int  # warp-gather halo radius (max exact displacement)
    H_true: int  # true global row count
    W: int
    # extra mesh axes carrying INDEPENDENT solves (e.g. 'batch'): the CG
    # trip count is pmax-synced over them so group-divergent while_loops
    # cannot deadlock the program-wide halo collectives
    sync_axes: tuple = ()


def spatial_plan(H, W, n, boundary_radius, halo, axis_name=SPACE_AXIS):
    """Geometry for sharding H rows over n devices, or None if infeasible.

    ``boundary_radius`` is the largest filter radius whose mirror fill must
    be synthesized inside the pad region (the weighted-median ``area_hsz``
    for the color path, the plain median radius otherwise).
    """
    if n <= 1:
        return None
    if H % n == 0:
        pad = 0
    else:
        # pad >= boundary_radius so every mirror read of a valid row lands
        # inside the fix-up region (never past the padded bottom edge)
        req = max(int(boundary_radius), 2)
        pad = req + (-(H + req)) % n
    Hp = H + pad
    Hs = Hp // n
    # single-hop halo exchange and in-shard fix-up feasibility
    if Hs < max(2 * pad + 1, boundary_radius + 1, halo + 1, 8):
        return None
    if pad > max(H - 1, 0):
        return None  # mirror pads need enough true rows
    return SpatialConfig(
        axis_name=axis_name, n=int(n), Hs=int(Hs), pad=int(pad),
        halo=int(halo), H_true=int(H), W=int(W),
    )


def _fixup_bottom(x, scfg: SpatialConfig, mode: str):
    """Overwrite the pad rows (last shard only) with mirrored true rows.

    ``mode``: 'reflect' (np.pad reflect — weighted median), 'symmetric'
    (scipy reflect — plain filters), or 'edge' (clamped warp reads).
    Static slices only; a no-op when there is no pad.
    """
    pad = scfg.pad
    if pad == 0:
        return x
    off = scfg.Hs - pad  # local row of the first pad row == H_true on shard n-1
    if mode == "reflect":
        fill = x[off - 1 - pad : off - 1][::-1]
    elif mode == "symmetric":
        fill = x[off - pad : off][::-1]
    else:  # edge
        fill = jnp.broadcast_to(x[off - 1 : off], (pad,) + x.shape[1:])
    fixed = jnp.concatenate([x[:off], fill], axis=0)
    idx = lax.axis_index(scfg.axis_name)
    return jnp.where(idx == scfg.n - 1, fixed, x)


# ---------------------------------------------------------------------------
# the local (inside-shard_map) level program
# ---------------------------------------------------------------------------


def classic_nl_level_local(cfg, scfg: SpatialConfig, images, color, uv, alpha):
    """One Classic+NL pyramid level on a row shard.

    ``images`` (Hs, W, 2), ``color`` (Hs, W, 3) [or any shape when
    ``cfg.use_color`` is False], ``uv`` (Hs, W, 2).  Mirrors
    ``classic_nl_level_step`` exactly (see module docstring).
    """
    irls = cfg.irls
    ax = scfg.axis_name
    R, Hs, W, H_true = scfg.halo, scfg.Hs, scfg.W, scfg.H_true
    dtype = uv.dtype
    if irls.interp not in ("bi-cubic", "bi-linear"):
        raise ValueError(
            f"spatial sharding supports bi-cubic/bi-linear warps, not {irls.interp!r}"
            " (the cubic B-spline prefilter is a global operator)"
        )

    f = np.asarray(irls.deriv_filter, dtype=np.float64)
    fx_k, fy_k, fxy_k = f.reshape(1, -1), f.reshape(-1, 1), np.outer(f, f)
    rv = fy_k.shape[0] // 2  # vertical radius of the derivative filter

    row0 = lax.axis_index(ax) * Hs
    g_col = row0 + lax.broadcasted_iota(jnp.int32, (Hs, 1), 0)  # global row ids
    valid = g_col < H_true  # (Hs, 1): true rows
    vmask = g_col < H_true - 1  # rows owning a live vertical edge

    nc = images.shape[2] // 2
    im1s = tuple(images[:, :, c] for c in range(nc))

    # one symmetric halo exchange of the pair serves every derivative filter;
    # with pad > 0 the image pad rows already hold symmetric-mirrored content
    # (set by the host wrapper), so plain interior arithmetic is exact at the
    # true bottom edge.
    im_ext = halo_exchange_rows(images, rv, ax, mode="symmetric")

    def corr(x_ext, kernel):
        """Correlation on a vertically pre-extended block (radius rv)."""
        kernel = np.atleast_2d(kernel)
        kh, kw = kernel.shape
        cy, cx = kh // 2, kw // 2
        padded = jnp.pad(x_ext, ((0, 0), (cx, kw - 1 - cx)), mode="symmetric")
        out = jnp.zeros((Hs, W), dtype=x_ext.dtype)
        base = rv - cy
        for dy in range(kh):
            for dx in range(kw):
                w = float(kernel[dy, dx])
                if w != 0.0:
                    out = out + w * padded[base + dy : base + dy + Hs, dx : dx + W]
        return out

    I1x = tuple(corr(im_ext[:, :, c], fx_k) for c in range(nc))
    I1y = tuple(corr(im_ext[:, :, c], fy_k) for c in range(nc))

    def table_ext(A):
        # pad rows -> edge copies of the true last row (matches the global
        # edge-padded corner reads), then the warp halo + one edge row/col
        # for the ceil-corner shifts
        A = _fixup_bottom(A, scfg, "edge")
        A = halo_exchange_rows(A, R, ax, mode="edge")
        return jnp.pad(A, ((0, 1), (0, 1)), mode="edge")

    if irls.interp == "bi-cubic":
        warp_tables = tuple(
            tuple(
                table_ext(T)
                for T in (
                    images[:, :, nc + c],
                    corr(im_ext[:, :, nc + c], fx_k),
                    corr(im_ext[:, :, nc + c], fy_k),
                    corr(im_ext[:, :, nc + c], fxy_k),
                )
            )
            for c in range(nc)
        )
    else:  # bi-linear: warp the image and its precomputed derivative images
        warp_tables = tuple(
            tuple(
                table_ext(T)
                for T in (
                    images[:, :, nc + c],
                    corr(im_ext[:, :, nc + c], fx_k),
                    corr(im_ext[:, :, nc + c], fy_k),
                )
            )
            for c in range(nc)
        )

    def to_local_rows(iy_global):
        return jnp.clip(iy_global - row0 + R, 0, Hs + 2 * R - 1)

    def shifted_planes(tabs, shifts):
        return jnp.stack(
            [T[a : a + Hs + 2 * R, b : b + W] for T in tabs for (a, b) in shifts],
            axis=-1,
        )

    def hermite_local(tabs, yq, xq):
        fy = jnp.floor(yq)
        fxq = jnp.floor(xq)
        oob = (fxq < 0) | (fxq + 1 > W - 1) | (fy < 0) | (fy + 1 > H_true - 1)
        iy0 = to_local_rows(jnp.clip(fy, 0, H_true - 1).astype(jnp.int32))
        ix0 = jnp.clip(fxq, 0, W - 1).astype(jnp.int32)
        taps = gather_planes(shifted_planes(tabs, HERMITE_CORNER_SHIFTS), iy0, ix0)
        val, vx, vy = hermite_eval(taps, xq - fxq, yq - fy, dtype)
        return val, vx, vy, oob

    def bilinear_local(tab, yq, xq):
        ysc = jnp.clip(yq, 0.0, H_true - 1.0)
        xsc = jnp.clip(xq, 0.0, W - 1.0)
        y0f = jnp.floor(ysc)
        x0f = jnp.floor(xsc)
        ay, axx = ysc - y0f, xsc - x0f
        iy0 = to_local_rows(y0f.astype(jnp.int32))
        ix0 = x0f.astype(jnp.int32)
        taps = gather_planes(
            shifted_planes((tab,), ((0, 0), (0, 1), (1, 0), (1, 1))), iy0, ix0
        )
        v00, v01, v10, v11 = (taps[..., k] for k in range(4))
        top = v00 * (1.0 - axx) + v01 * axx
        bot = v10 * (1.0 - axx) + v11 * axx
        return top * (1.0 - ay) + bot * ay

    ygrid = (g_col + jnp.zeros((Hs, W), jnp.int32)).astype(dtype)
    xgrid = lax.broadcasted_iota(jnp.int32, (Hs, W), 1).astype(dtype)
    blend = irls.blend

    def warp_deriv_local(uv):
        xq = xgrid + uv[:, :, 0]
        yq = ygrid + uv[:, :, 1]
        B = (xq > W - 1) | (xq < 0) | (yq > H_true - 1) | (yq < 0)
        Its, Ixs, Iys = [], [], []
        for c in range(nc):
            if irls.interp == "bi-cubic":
                warp, wx, wy, mask = hermite_local(warp_tables[c], yq, xq)
            else:
                t_im, t_dx, t_dy = warp_tables[c]
                warp = bilinear_local(t_im, yq, xq)
                wx = bilinear_local(t_dx, yq, xq)
                wy = bilinear_local(t_dy, yq, xq)
                mask = B
            zero = jnp.zeros((), dtype=dtype)
            Its.append(jnp.where(mask, zero, warp - im1s[c]))
            Ixs.append(jnp.where(mask, zero, blend * wx + (1 - blend) * I1x[c]))
            Iys.append(jnp.where(mask, zero, blend * wy + (1 - blend) * I1y[c]))
        if nc == 1:
            return Its[0], Ixs[0], Iys[0]
        return tuple(jnp.stack(t, axis=2) for t in (Its, Ixs, Iys))

    # ------------------------------------------------------------------
    # IRLS system on the shard (mirrors ops/stencil.build_irls_system)
    # ------------------------------------------------------------------
    def cmean(x):
        return jnp.mean(x, axis=2) if x.ndim == 3 else x

    zero = jnp.zeros((), dtype=dtype)

    def build_sys_local(uv, duv, It, Ix, Iy, rsu, rsv, rd, lam):
        u, v = uv[:, :, 0], uv[:, :, 1]
        up = u + duv[:, :, 0]
        vp = v + duv[:, :, 1]
        up_e = halo_exchange_rows(up, 1, ax, mode="edge")
        vp_e = halo_exchange_rows(vp, 1, ax, mode="edge")

        def fdh(x):  # horizontal forward diff, 0 in the last column
            return jnp.pad(x[:, 1:] - x[:, :-1], ((0, 0), (0, 1)))

        wu_h = rsu[0].deriv_over_x(fdh(up))
        wu_v = rsu[1].deriv_over_x(up_e[2:] - up_e[1:-1])
        wv_h = rsv[0].deriv_over_x(fdh(vp))
        wv_v = rsv[1].deriv_over_x(vp_e[2:] - vp_e[1:-1])
        col_mask = jnp.ones((Hs, W), dtype=dtype).at[:, -1].set(0.0)
        wu_h = jnp.where(valid, lam * wu_h * col_mask, zero)
        wv_h = jnp.where(valid, lam * wv_h * col_mask, zero)
        wu_v = jnp.where(vmask, lam * wu_v, zero)
        wv_v = jnp.where(vmask, lam * wv_v, zero)

        if It.ndim == 3:
            It_lin = It + Ix * duv[:, :, 0:1] + Iy * duv[:, :, 1:2]
        else:
            It_lin = It + Ix * duv[:, :, 0] + Iy * duv[:, :, 1]
        pp_d = cmean(rd.deriv_over_x(It_lin))
        a11 = jnp.where(valid, pp_d * cmean(Ix**2), zero)
        a12 = jnp.where(valid, pp_d * cmean(Ix * Iy), zero)
        a22 = jnp.where(valid, pp_d * cmean(Iy**2), zero)
        b_u = -sharded_laplacian_apply_local(wu_h, wu_v, u, ax) - pp_d * cmean(It_lin * Ix)
        b_v = -sharded_laplacian_apply_local(wv_h, wv_v, v, ax) - pp_d * cmean(It_lin * Iy)
        b_u = jnp.where(valid, b_u, zero)
        b_v = jnp.where(valid, b_v, zero)
        return FlowSystem(a11, a12, a22, wu_h, wu_v, wv_h, wv_v, b_u, b_v)

    solver = irls.solver[0]
    if solver == "pcg":
        rtol, maxiter = irls.solver[1], irls.solver[2]
    elif solver == "backslash":
        rtol, maxiter = irls.solver[3], irls.solver[4]
    else:
        raise ValueError(f"spatial sharding does not support solver {solver!r}")

    def blended_solve_local(uv, duv, It, Ix, Iy):
        sys_q = build_sys_local(
            uv, duv, It, Ix, Iy,
            irls.qua_rho_spatial_u, irls.qua_rho_spatial_v, irls.qua_rho_data,
            irls.lambda_q,
        )
        sys_r = build_sys_local(
            uv, duv, It, Ix, Iy,
            irls.rho_spatial_u, irls.rho_spatial_v, irls.rho_data,
            irls.lambda_,
        )
        sys = blend_systems(alpha, sys_q, sys_r)
        x = solve_flow_system_local(sys, ax, rtol, maxiter, sync_axes=scfg.sync_axes)
        if irls.limit_update:
            x = jnp.clip(x, -1.0, 1.0)
        return x

    # ------------------------------------------------------------------
    # occlusion (ops/occlusion.py, sharded)
    # ------------------------------------------------------------------
    sigma_d, sigma_i_occ = 0.3, 20.0

    def occlusion_local(uv):
        u, v = uv[:, :, 0], uv[:, :, 1]
        dudx = jnp.pad(u[:, 1:] - u[:, :-1], ((0, 0), (1, 0)))
        v_e = halo_exchange_rows(v, 1, ax, mode="edge")  # top fill => 0 diff at row 0
        dvdy = v_e[1:-1] - v_e[:-2]
        div = dudx + dvdy
        xq = xgrid + u
        yq = ygrid + v
        It = jnp.zeros_like(u)
        for c in range(nc):
            warp = bilinear_local(warp_tables[c][0], yq, xq)
            It = It + jnp.abs(warp - im1s[c])
        It = It / nc
        return jnp.exp(-(div**2) / (2.0 * sigma_d**2)) * jnp.exp(
            -(It**2) / (2.0 * sigma_i_occ**2)
        )

    # ------------------------------------------------------------------
    # non-local term (ops/wmedian.py, sharded; reflect boundary at true edges)
    # ------------------------------------------------------------------
    if irls.median_filter_size is not None and cfg.use_color:
        hsz = int(cfg.area_hsz)
        color_fixed = _fixup_bottom(color, scfg, "reflect")
        color_pad = jnp.pad(
            halo_exchange_rows(color_fixed, hsz, ax, mode="reflect"),
            ((0, 0), (hsz, hsz), (0, 0)),
            mode="reflect",
        )

        def nl_filter(new_uv, occ):
            def prep(x):
                x = _fixup_bottom(x, scfg, "reflect")
                x = halo_exchange_rows(x, hsz, ax, mode="reflect")
                return jnp.pad(x, ((0, 0), (hsz, hsz)), mode="reflect")

            return wmedfilt_prepadded(
                prep(new_uv[:, :, 0]), prep(new_uv[:, :, 1]), prep(occ),
                color_pad, color_fixed, Hs, W, hsz, float(cfg.sigma_i),
            )

    elif irls.median_filter_size is not None:
        kh, kw = irls.median_filter_size
        cy, cx = kh // 2, kw // 2

        def median_local(x):
            x = _fixup_bottom(x, scfg, "symmetric")
            x_ext = halo_exchange_rows(x, cy, ax, mode="symmetric")
            padded = jnp.pad(x_ext, ((0, 0), (cx, kw - 1 - cx)), mode="symmetric")
            views = [
                padded[dy : dy + Hs, dx : dx + W]
                for dy in range(kh)
                for dx in range(kw)
            ]
            stack = jnp.sort(jnp.stack(views, axis=-1), axis=-1)
            return stack[..., (kh * kw) // 2]

        def nl_filter(new_uv, occ):
            return jnp.stack(
                [median_local(new_uv[:, :, 0]), median_local(new_uv[:, :, 1])],
                axis=-1,
            )

    # ------------------------------------------------------------------
    # warping loop (classic_nl.py:228-277)
    # ------------------------------------------------------------------
    def warp_iter(_, uv):
        It, Ix, Iy = warp_deriv_local(uv)
        duv = jnp.zeros_like(uv)
        for _j in range(irls.max_linear):
            duv = blended_solve_local(uv, duv, It, Ix, Iy)
            if irls.median_filter_size is not None:
                new_uv = uv + duv
                occ = occlusion_local(new_uv)
                duv = nl_filter(new_uv, occ) - uv
        return uv + duv

    return lax.fori_loop(0, irls.max_iters, warp_iter, uv)


# ---------------------------------------------------------------------------
# host-callable wrappers
# ---------------------------------------------------------------------------

_spatial_cache: dict = {}


def classic_nl_level_step_spatial(cfg, images, color, uv, alpha, mesh, halo: int = 6):
    """Row-sharded ``classic_nl_level_step``; falls back single-device when
    the level is too small to tile (coarse pyramid levels)."""
    H, W = images.shape[:2]
    n = int(mesh.shape[SPACE_AXIS])
    if cfg.use_color:
        boundary_radius = int(cfg.area_hsz)
    elif cfg.irls.median_filter_size is not None:
        boundary_radius = int(cfg.irls.median_filter_size[0]) // 2
    else:
        boundary_radius = 2
    scfg = spatial_plan(H, W, n, boundary_radius, halo)
    if scfg is None or cfg.irls.interp not in ("bi-cubic", "bi-linear") or (
        cfg.irls.solver[0] not in ("pcg", "backslash")
    ):
        from optical_flow_tpu.methods.classic_nl import classic_nl_level_step

        return classic_nl_level_step(cfg, images, color, uv, alpha)

    key = (cfg, scfg, mesh)
    if key not in _spatial_cache:
        spec = P(SPACE_AXIS)
        color_spec = spec if cfg.use_color else P()
        smapped = shard_map(
            partial(classic_nl_level_local, cfg, scfg),
            mesh=mesh,
            in_specs=(spec, color_spec, spec, P()),
            out_specs=spec,
            check_rep=False,
        )

        def run(images, color, uv, alpha):
            if scfg.pad:
                # symmetric image pad == scipy-'reflect' filter reads beyond
                # the true edge; color pad mirrors the median's np-'reflect'
                images = jnp.pad(
                    images, ((0, scfg.pad), (0, 0), (0, 0)), mode="symmetric"
                )
                if cfg.use_color:
                    color = jnp.pad(
                        color, ((0, scfg.pad), (0, 0), (0, 0)), mode="reflect"
                    )
                uv = jnp.pad(uv, ((0, scfg.pad), (0, 0), (0, 0)))
            out = smapped(images, color, uv, alpha)
            out = out[:H] if scfg.pad else out
            if cfg.irls.guard:
                # guard on the GLOBAL view, outside shard_map: a per-shard
                # rollback would splice healthy and rolled-back tiles
                from optical_flow_tpu.utils.guard import guard_level

                out = guard_level(out, uv[:H], cfg.irls.guard)
            return out

        _spatial_cache[key] = jax.jit(run)
    return _spatial_cache[key](images, color, uv, jnp.asarray(alpha, uv.dtype))
