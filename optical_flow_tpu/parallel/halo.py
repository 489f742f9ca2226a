"""Halo exchange for row-sharded image fields inside ``shard_map``.

The image grid is tiled along H across the ``space`` mesh axis.  Every
stencil of radius r needs r rows from each neighbor; strips move between
ICI neighbors with ``lax.ppermute`` (the same communication shape as ring
attention's KV rotation).  Global edges receive zero rows — correct for the
flow Laplacian because its dangling edge weights are zero by construction
(ops/stencil.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _shift_down(x_slice, axis_name: str):
    """Send each shard's strip to the NEXT shard (receive from previous)."""
    n = lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return lax.ppermute(x_slice, axis_name, perm)


def _shift_up(x_slice, axis_name: str):
    """Send each shard's strip to the PREVIOUS shard (receive from next)."""
    n = lax.axis_size(axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(x_slice, axis_name, perm)


def halo_exchange_rows(x, radius: int, axis_name: str):
    """Extend a local (Hs, W[, C]) block with ``radius`` rows of halo.

    Returns an array of shape (Hs + 2*radius, W[, C]); missing neighbors
    (global top/bottom) contribute zero rows.
    """
    top_halo = _shift_down(x[-radius:], axis_name)  # from the shard above
    bottom_halo = _shift_up(x[:radius], axis_name)  # from the shard below
    return jnp.concatenate([top_halo, x, bottom_halo], axis=0)
