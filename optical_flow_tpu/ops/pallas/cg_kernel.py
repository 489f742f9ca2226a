"""Pallas TPU kernel: VMEM-resident whole-PCG solve.

The XLA ``pcg_solve`` while_loop streams ~20 (H, W) arrays through HBM
every iteration (~34 us/iter at 388x584 on the v5e — bandwidth-bound, not
op-overhead: measured 0.41 ms/solve at rtol 1e-6 by N-scaling jitted
loops, which cancels the ~30 ms tunnel fetch that polluted earlier
per-solve figures).  This kernel runs the entire block-Jacobi PCG loop
inside one Mosaic program with every coefficient field and CG state array
resident in VMEM, so iterations run at VPU speed with zero HBM traffic:
measured ~0.01-0.07 ms/solve at the same size and tolerance, and a
whole-frame classic+nl-fast A/B improves 0.286 -> 0.247 s/frame with
identical AAE/AEPE (2.500 / 0.0813).  The working set (~24 (H, W) f32
planes) needs the per-kernel ``vmem_limit_bytes`` raised past Mosaic's
16 MB default; ``cg_pallas_ok`` gates on the budget and the caller falls
back to the XLA path (finest 4K levels, f64 parity runs).

Semantics match :func:`optical_flow_tpu.solvers.cg.pcg_solve` exactly
(same update formulas, same ``||r||^2 > rtol^2 ||b||^2`` stopping rule
checked before every iteration, same 2x2 block-Jacobi preconditioner with
the reference's 1e-12 diagonal guard); float rounding differs only by
reduction order.  The caller gates on VMEM fit and falls back to the XLA
path (``solvers/cg.py``).

Batching rides a leading GRID axis claimed through ``custom_vmap`` (same
pattern as the weighted-median kernel): the vmapped data-parallel level
programs run B independent solves as B grid programs of one kernel, each
with its own convergence trip count.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_left0(x):
    """x[i, j+1], zero in the last column."""
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def _shift_right0(x):
    """x[i, j-1], zero in the first column."""
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _shift_up0(x):
    """x[i+1, j], zero in the last row."""
    return jnp.concatenate([x[1:, :], jnp.zeros_like(x[:1, :])], axis=0)


def _shift_down0(x):
    """x[i-1, j], zero in the first row."""
    return jnp.concatenate([jnp.zeros_like(x[:1, :]), x[:-1, :]], axis=0)


def _lap_apply(w_h, w_v, x):
    """``F^T diag(w) F x`` — mirrors ``ops.stencil.weighted_laplacian_apply``
    (w_h is zero in the last column, w_v in the last row, by construction)."""
    eh = w_h * (x - _shift_left0(x))
    ev = w_v * (x - _shift_up0(x))
    return eh + ev - _shift_right0(eh) - _shift_down0(ev)


def _lap_diag(w_h, w_v):
    return w_h + _shift_right0(w_h) + w_v + _shift_down0(w_v)


def _cg_kernel(
    a11_ref,
    a12_ref,
    a22_ref,
    wuh_ref,
    wuv_ref,
    wvh_ref,
    wvv_ref,
    bu_ref,
    bv_ref,
    xu_out,
    xv_out,
    ru_ref,
    rv_ref,
    pu_ref,
    pv_ref,
    *,
    rtol: float,
    maxiter: int,
):
    a11 = a11_ref[0]
    a12 = a12_ref[0]
    a22 = a22_ref[0]
    wuh = wuh_ref[0]
    wuv = wuv_ref[0]
    wvh = wvh_ref[0]
    wvv = wvv_ref[0]
    bu = bu_ref[0]
    bv = bv_ref[0]

    # block-Jacobi preconditioner (solvers/cg.py: same guards)
    du = a11 + _lap_diag(wuh, wuv)
    dv = a22 + _lap_diag(wvh, wvv)
    dinv_u = jnp.where(jnp.abs(du) > 1e-12, 1.0 / du, 0.0)
    dinv_v = jnp.where(jnp.abs(dv) > 1e-12, 1.0 / dv, 0.0)
    det = du * dv - a12 * a12
    ok = jnp.abs(det) > 1e-12
    safe = jnp.where(ok, det, 1.0)
    i00 = jnp.where(ok, dv / safe, dinv_u)
    i01 = jnp.where(ok, -a12 / safe, 0.0)
    i11 = jnp.where(ok, du / safe, dinv_v)

    def apply_A(xu, xv):
        yu = a11 * xu + a12 * xv + _lap_apply(wuh, wuv, xu)
        yv = a12 * xu + a22 * xv + _lap_apply(wvh, wvv, xv)
        return yu, yv

    # x0 = 0  =>  r0 = b;  z0 = M^-1 r0;  p0 = z0
    xu_out[0] = jnp.zeros_like(bu)
    xv_out[0] = jnp.zeros_like(bv)
    ru_ref[:] = bu
    rv_ref[:] = bv
    zu = i00 * bu + i01 * bv
    zv = i01 * bu + i11 * bv
    pu_ref[:] = zu
    pv_ref[:] = zv
    rz0 = jnp.sum(bu * zu) + jnp.sum(bv * zv)
    bb = jnp.sum(bu * bu) + jnp.sum(bv * bv)
    tol2 = (rtol * rtol) * bb

    def cond(state):
        k, rz, rr = state
        return jnp.logical_and(k < maxiter, rr > tol2)

    def body(state):
        k, rz, _ = state
        pu = pu_ref[:]
        pv = pv_ref[:]
        Apu, Apv = apply_A(pu, pv)
        pAp = jnp.sum(pu * Apu) + jnp.sum(pv * Apv)
        alpha = jnp.where(pAp != 0.0, rz / pAp, 0.0)
        xu_out[0] = xu_out[0] + alpha * pu
        xv_out[0] = xv_out[0] + alpha * pv
        ru = ru_ref[:] - alpha * Apu
        rv = rv_ref[:] - alpha * Apv
        ru_ref[:] = ru
        rv_ref[:] = rv
        zu = i00 * ru + i01 * rv
        zv = i01 * ru + i11 * rv
        rz_new = jnp.sum(ru * zu) + jnp.sum(rv * zv)
        beta = jnp.where(rz != 0.0, rz_new / rz, 0.0)
        pu_ref[:] = zu + beta * pu
        pv_ref[:] = zv + beta * pv
        rr = jnp.sum(ru * ru) + jnp.sum(rv * rv)
        return k + 1, rz_new, rr

    jax.lax.while_loop(cond, body, (jnp.int32(0), rz0, bb))


def _cg_call(fields, *, rtol, maxiter, interpret):
    """(B, H, W) coefficient fields -> (B, H, W) xu, xv."""
    B, H, W = fields[0].shape
    dtype = fields[0].dtype
    kernel = functools.partial(_cg_kernel, rtol=float(rtol), maxiter=int(maxiter))
    blk = lambda: pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    xu, xv = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), dtype),
            jax.ShapeDtypeStruct((B, H, W), dtype),
        ],
        in_specs=[blk() for _ in range(9)],
        out_specs=[blk(), blk()],
        scratch_shapes=[pltpu.VMEM((H, W), dtype) for _ in range(4)],
        # the whole-solve working set (~20 live (H, W) planes at 584x388)
        # exceeds Mosaic's default 16 MB scoped-VMEM budget; the v5e has
        # 128 MB, so raise the per-kernel cap to cover the finest level.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*fields)
    return xu, xv


@functools.lru_cache(maxsize=None)
def _cg_dispatch(rtol, maxiter, interpret):
    call = functools.partial(_cg_call, rtol=rtol, maxiter=maxiter, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def solve(*fields):
        xu, xv = call([f[None] for f in fields])
        return jnp.stack([xu[0], xv[0]], axis=-1)

    @solve.def_vmap
    def _rule(axis_size, in_batched, *fields):
        fields = [
            f if bat else jnp.broadcast_to(f, (axis_size, *f.shape))
            for f, bat in zip(fields, in_batched)
        ]
        xu, xv = call(fields)
        return jnp.stack([xu, xv], axis=-1), True

    return solve


def cg_solve_pallas(sys, rtol: float, maxiter: int, interpret: bool = False):
    """Solve a :class:`~optical_flow_tpu.ops.stencil.FlowSystem`, whole PCG
    loop in one Mosaic program.  Returns (H, W, 2) like ``solve_flow_system``.
    vmap-safe (leading batch GRID axis via ``custom_vmap``)."""
    solve = _cg_dispatch(float(rtol), int(maxiter), bool(interpret))
    return solve(
        sys.a11,
        sys.a12,
        sys.a22,
        sys.wu_h,
        sys.wu_v,
        sys.wv_h,
        sys.wv_v,
        sys.b_u,
        sys.b_v,
    )


_VMEM_LIMIT = 40 * 1024 * 1024


def cg_pallas_ok(H, W, dtype_bytes: int = 4, budget_bytes: int = _VMEM_LIMIT - 6 * 1024 * 1024) -> bool:
    """True when all coefficient + state arrays fit the kernel's VMEM budget.

    ~24 live (H, W) arrays (9 coefficients, 3 preconditioner fields, 6 CG
    state, temporaries), padded up to (8, 128) vector tiles.  Mosaic's
    measured stack allocation at 388x584 is 19.6 MB (~19.5 planes); the
    24-plane model plus a 6 MB margin under ``_VMEM_LIMIT`` keeps headroom.
    """
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    return 24 * Hp * Wp * dtype_bytes <= budget_bytes
