"""Distributed matrix-free CG over a row-sharded image grid.

The flow system's stencil structure makes the distributed solver cheap:
one radius-1 halo exchange (``ppermute`` over ICI) per operator apply, and
``psum``-reduced inner products — the Schur-complement-free analog of the
reference's global ``spsolve`` (which cannot scale at all, SURVEY §5).

Functions suffixed ``_local`` expect to run *inside* ``shard_map`` with the
leading (H) axis sharded over ``axis_name``; ``solve_flow_system_sharded``
is the host-callable wrapper.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from optical_flow_tpu.ops.stencil import (
    FlowSystem,
    weighted_laplacian_apply,
    weighted_laplacian_diag,
)
from optical_flow_tpu.parallel.halo import halo_exchange_rows
from optical_flow_tpu.parallel.mesh import SPACE_AXIS
from optical_flow_tpu.solvers.cg import pcg_solve, pcg_solve_gear


def _zero_row_pad(x):
    return jnp.pad(x, ((1, 1), (0, 0)))


def sharded_laplacian_apply_local(w_h, w_v, x, axis_name: str):
    """Edge-weighted Laplacian on a row-sharded block (radius-1 halo)."""
    x_e = halo_exchange_rows(x, 1, axis_name)
    wv_e = halo_exchange_rows(w_v, 1, axis_name)
    # halo rows of w_h never influence the cropped interior rows
    out_e = weighted_laplacian_apply(_zero_row_pad(w_h), wv_e, x_e)
    return out_e[1:-1]


def sharded_laplacian_diag_local(w_h, w_v, axis_name: str):
    wv_e = halo_exchange_rows(w_v, 1, axis_name)
    diag_e = weighted_laplacian_diag(_zero_row_pad(w_h), wv_e)
    return diag_e[1:-1]


def sharded_system_apply_local(sys: FlowSystem, x, axis_name: str):
    xu, xv = x[:, :, 0], x[:, :, 1]
    yu = sys.a11 * xu + sys.a12 * xv + sharded_laplacian_apply_local(
        sys.wu_h, sys.wu_v, xu, axis_name
    )
    yv = sys.a12 * xu + sys.a22 * xv + sharded_laplacian_apply_local(
        sys.wv_h, sys.wv_v, xv, axis_name
    )
    return jnp.stack([yu, yv], axis=-1)


def sharded_system_diag_local(sys: FlowSystem, axis_name: str):
    du = sys.a11 + sharded_laplacian_diag_local(sys.wu_h, sys.wu_v, axis_name)
    dv = sys.a22 + sharded_laplacian_diag_local(sys.wv_h, sys.wv_v, axis_name)
    return jnp.stack([du, dv], axis=-1)


def solve_flow_system_local(
    sys: FlowSystem,
    axis_name: str = SPACE_AXIS,
    rtol: float = 1e-3,
    maxiter: int = 200,
    x0=None,
    sync_axes=(),
    algo: str | None = None,
):
    """PCG on a row-sharded FlowSystem; call inside ``shard_map``.

    Halo exchange rides ICI in every apply; dot products are
    ``psum``-reduced so every shard sees identical scalars (identical
    control flow in the while_loop).  ``sync_axes`` forces a uniform trip
    count across additional mesh axes running independent solves (see
    :func:`~optical_flow_tpu.solvers.cg.pcg_solve`).

    ``algo='gear'`` uses the Chronopoulos–Gear recurrence so the three
    per-iteration scalars reduce in ONE stacked ``psum`` instead of
    classic PCG's three collective rounds (p·Ap / r·z / stopping ‖r‖² —
    HLO-verified 3→1 ``all-reduce`` count, ``test_parallel.py``).
    Measured 2.55× on the 2-process Gloo dryrun where every collective
    round-trips the cross-process runtime (best-of-3, MULTIHOST.json;
    solution diff vs classic 7e-7); single-chip, where reduces are
    compute not latency, it is a measured loss (2.14→2.56 ms/iter,
    DESIGN §4a).  Default follows ``OFTPU_CG_ALGO`` ('classic' unless set:
    same-recurrence-everywhere keeps sharded-vs-single-device parity at
    the 1e-8 the test suite pins).
    """
    if algo is None:
        from optical_flow_tpu.solvers.cg import CG_ALGO

        algo = CG_ALGO
    b = jnp.stack([sys.b_u, sys.b_v], axis=-1)
    diag = sharded_system_diag_local(sys, axis_name)
    apply_A = lambda x: sharded_system_apply_local(sys, x, axis_name)
    # a12 is per-pixel local: the block-Jacobi preconditioner shards freely
    if algo == "gear":

        def dots3(r, u, w):
            partial_sums = jnp.stack(
                [jnp.sum(r * u), jnp.sum(w * u), jnp.sum(r * r)]
            )
            s = lax.psum(partial_sums, axis_name)  # one collective, 3 scalars
            return s[0], s[1], s[2]

        return pcg_solve_gear(
            apply_A, b, diag, rtol, maxiter,
            x0=x0, dots3=dots3, sync_axes=sync_axes, a12=sys.a12,
        )
    dot = lambda a, c: lax.psum(jnp.sum(a * c), axis_name)
    return pcg_solve(
        apply_A, b, diag, rtol, maxiter, x0=x0, dot=dot, sync_axes=sync_axes, a12=sys.a12
    )


def solve_flow_system_sharded(
    sys: FlowSystem,
    mesh,
    rtol: float = 1e-3,
    maxiter: int = 200,
    axis_name: str = SPACE_AXIS,
    algo: str | None = None,
):
    """Host-callable distributed solve: rows of every field sharded."""
    spec2 = P(axis_name)
    spec3 = P(axis_name)
    fn = shard_map(
        partial(
            solve_flow_system_local,
            axis_name=axis_name,
            rtol=rtol,
            maxiter=maxiter,
            algo=algo,
        ),
        mesh=mesh,
        in_specs=(FlowSystem(*([spec2] * 9)),),
        out_specs=spec3,
        check_rep=False,
    )
    return fn(sys)
