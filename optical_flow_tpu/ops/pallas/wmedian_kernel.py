"""Pallas TPU kernel: color-guided weighted median via exact bit-bisection.

The XLA formulation (ops/wmedian.py) materializes (H, W, 225) patch stacks
in HBM and key-value sorts them — ~200 MB of temporaries per call and a
bitonic sort over the patch axis.  This kernel computes the identical
weighted median with O(tile) VMEM and no sort:

* float32 order is isomorphic to signed int32 order under a sign-magnitude
  flip (TPU vectors have no unsigned min/max), so the weighted median is:
  the smallest key ``m`` with  S(m) = sum of weights of values <= m  >=
  total/2.  32 rounds of integer bisection over the key space find ``m``
  exactly — the invariant S(lo) < total/2 <= S(hi) contracts to adjacent
  integers, and since S only jumps at present values, ``hi`` lands exactly
  on a sample.  This reproduces the reference's sort+cumsum+searchsorted
  selection (``weighted_median.py:5-21``) without ordering any data.
* Both flow fields bisect in the SAME loop: each round makes one fused VPU
  pass over the (TILE_H, K2, TILE_W) key/weight slabs, so the shared weight
  slab is read once per round (not once per field) and the two dependence
  chains interleave.  Comparisons stay in int key space — decoding midpoint
  keys to float thresholds would pass through the denormal range, which the
  TPU flushes to zero, corrupting the selection near 0.
* The grid tiles the image (8 rows x TILE_W cols per program; TILE_W picked
  per image width to minimize lane padding).  Each program DMAs its input
  windows from HBM into VMEM scratch, carves the K2 patch offsets out with
  *static* value slices (TPU alignment rules: static offsets are free,
  dynamic offsets must be tile-aligned), and keeps the (8, K2, TILE_W)
  weight/value stacks in VMEM.  HBM sees each input pixel ~once per
  overlapping window.

Because inputs stay in HBM and only windows are DMA'd, the kernel scales
to arbitrary image sizes (4K included).  Mirror padding and the (H, W)
crop are handled by the wrapper.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
_TILE_W_CHOICES = (128, 256, 384, 512)
_ROW_WINDOW = 32  # >= TILE_H + 2*hsz for hsz <= 12, 8-aligned
_COL_PAD = 128  # window = TILE_W + _COL_PAD >= TILE_W + 2*hsz, 128-aligned

_SIGN = np.int32(np.uint32(0x80000000).view(np.int32))  # int32 min


# Mosaic's scoped-VMEM limit is 16 MB and is SHARED with whatever other
# buffers are live at the call site inside a fused monolith (the kernel's
# result tensor itself lands in VMEM when a downstream fusion consumes it),
# so the kernel keeps its own footprint well under half of it.
_VMEM_BUDGET = 8 * 1024 * 1024


def _tile_bytes(tile_w: int, hsz: int, C: int) -> int:
    K2 = (2 * hsz + 1) ** 2
    windows = (3 + C) * _ROW_WINDOW * (tile_w + _COL_PAD) * 4
    scratch = 3 * TILE_H * K2 * tile_w * 4
    return windows + scratch


def _pick_tile_w(W: int, hsz: int, C: int) -> int:
    """Narrowest VMEM-feasible tile among those minimizing the padded width."""
    feasible = [tw for tw in _TILE_W_CHOICES if _tile_bytes(tw, hsz, C) <= _VMEM_BUDGET]
    if not feasible:
        return _TILE_W_CHOICES[0]
    return min(feasible, key=lambda tw: (-(-W // tw) * tw, tw))


def _encode_f32(x):
    """Order-isomorphic SIGNED int32 key of a float32 value.

    x >= 0 -> raw bits; x < 0 -> ~bits ^ 0x80000000.  Signed integer order
    then matches float order.
    """
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b < 0, jnp.invert(b) ^ _SIGN, b)


def _decode_i32(key):
    """Inverse of :func:`_encode_f32`."""
    b = jnp.where(key < 0, jnp.invert(key ^ _SIGN), key)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _midpoint(lo, hi):
    """Overflow-safe floor((lo + hi) / 2) for signed int32."""
    return (lo & hi) + ((lo ^ hi) >> 1)


def _wmedian_kernel(
    u_hbm,
    v_hbm,
    occ_hbm,
    color_hbm,
    out_ref,
    u_win,
    v_win,
    occ_win,
    color_win,
    w_s,
    ku_s,
    kv_s,
    copy_sem,
    *,
    hsz: int,
    n_chan: int,
    inv_2sigma2: float,
    tile_w: int,
):
    k = 2 * hsz + 1
    K2 = k * k
    col_window = tile_w + _COL_PAD
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    r0 = pl.multiple_of(i * TILE_H, TILE_H)
    c0 = pl.multiple_of(j * tile_w, 128)

    # DMA this program's input windows from HBM into VMEM.  Inputs carry a
    # leading batch axis (grid dim 0): the SAME kernel serves the single-pair
    # path (B=1) and the vmapped batched path (custom_vmap routes here).
    copies = [
        pltpu.make_async_copy(
            u_hbm.at[b, pl.ds(r0, _ROW_WINDOW), pl.ds(c0, col_window)], u_win, copy_sem.at[0]
        ),
        pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(r0, _ROW_WINDOW), pl.ds(c0, col_window)], v_win, copy_sem.at[1]
        ),
        pltpu.make_async_copy(
            occ_hbm.at[b, pl.ds(r0, _ROW_WINDOW), pl.ds(c0, col_window)], occ_win, copy_sem.at[2]
        ),
        pltpu.make_async_copy(
            color_hbm.at[b, :, pl.ds(r0, _ROW_WINDOW), pl.ds(c0, col_window)],
            color_win,
            copy_sem.at[3],
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    Bo = occ_win[:]
    Bu = u_win[:]
    Bv = v_win[:]
    Bc = [color_win[c] for c in range(n_chan)]
    centers = [B[hsz : hsz + TILE_H, hsz : hsz + tile_w] for B in Bc]

    # ---- one pass: weights + key slabs + per-field key min/max -------------
    total = jnp.zeros((TILE_H, tile_w), jnp.float32)
    umin = umax = vmin = vmax = None
    for o in range(K2):
        dy, dx = o // k, o % k
        cdiff = jnp.zeros((TILE_H, tile_w), jnp.float32)
        for c in range(n_chan):
            patch = Bc[c][dy : dy + TILE_H, dx : dx + tile_w]
            cdiff = cdiff + (patch - centers[c]) ** 2
        occ = Bo[dy : dy + TILE_H, dx : dx + tile_w]
        w = jnp.maximum(jnp.exp(-cdiff * inv_2sigma2) * occ, 1e-10)
        w_s[:, o, :] = w
        total = total + w
        ku = _encode_f32(Bu[dy : dy + TILE_H, dx : dx + tile_w])
        kv = _encode_f32(Bv[dy : dy + TILE_H, dx : dx + tile_w])
        ku_s[:, o, :] = ku
        kv_s[:, o, :] = kv
        if o == 0:
            umin = umax = ku
            vmin = vmax = kv
        else:
            umin, umax = jnp.minimum(umin, ku), jnp.maximum(umax, ku)
            vmin, vmax = jnp.minimum(vmin, kv), jnp.maximum(vmax, kv)
    half = total * 0.5

    # S(lo) must be < half: step just below the smallest present key
    # (finite float32 never encodes to int32 min, so this cannot wrap)
    lou, hiu = umin - 1, umax
    lov, hiv = vmin - 1, vmax

    def bisect(_, carry):
        lou, hiu, lov, hiv = carry
        midu = _midpoint(lou, hiu)[:, None, :]
        midv = _midpoint(lov, hiv)[:, None, :]
        w = w_s[:]
        Su = jnp.sum(jnp.where(ku_s[:] <= midu, w, 0.0), axis=1)
        Sv = jnp.sum(jnp.where(kv_s[:] <= midv, w, 0.0), axis=1)
        geu = Su >= half
        gev = Sv >= half
        midu = midu[:, 0, :]
        midv = midv[:, 0, :]
        return (
            jnp.where(geu, lou, midu),
            jnp.where(geu, midu, hiu),
            jnp.where(gev, lov, midv),
            jnp.where(gev, midv, hiv),
        )

    lou, hiu, lov, hiv = jax.lax.fori_loop(0, 32, bisect, (lou, hiu, lov, hiv))
    out_ref[0, :, :, 0] = _decode_i32(hiu)
    out_ref[0, :, :, 1] = _decode_i32(hiv)


def _wmedian_call(u, v, occ, color, *, out_hw, hsz, sigma_i, interpret):
    """Batched kernel invocation: (B, Hp, Wp) fields + (B, C, Hp, Wp) guide
    -> (B, H, W, 2) medians, one pallas_call with a leading batch grid axis."""
    B = u.shape[0]
    H, W = out_hw
    C = color.shape[1]
    tile_w = _pick_tile_w(W, hsz, C)
    col_window = tile_w + _COL_PAD
    n_row = -(-H // TILE_H)
    n_col = -(-W // tile_w)
    kernel = functools.partial(
        _wmedian_kernel,
        hsz=hsz,
        n_chan=C,
        inv_2sigma2=float(1.0 / (2.0 * sigma_i**2)),
        tile_w=tile_w,
    )
    K2 = (2 * hsz + 1) ** 2
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_row, n_col),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_row * TILE_H, n_col * tile_w, 2), jnp.float32
        ),
        in_specs=[hbm(), hbm(), hbm(), hbm()],
        out_specs=pl.BlockSpec(
            (1, TILE_H, tile_w, 2), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROW_WINDOW, col_window), jnp.float32),  # u window
            pltpu.VMEM((_ROW_WINDOW, col_window), jnp.float32),  # v window
            pltpu.VMEM((_ROW_WINDOW, col_window), jnp.float32),  # occ window
            pltpu.VMEM((C, _ROW_WINDOW, col_window), jnp.float32),  # color window
            pltpu.VMEM((TILE_H, K2, tile_w), jnp.float32),  # weights
            pltpu.VMEM((TILE_H, K2, tile_w), jnp.int32),  # u keys
            pltpu.VMEM((TILE_H, K2, tile_w), jnp.int32),  # v keys
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(u, v, occ, color)
    return out[:, :H, :W]


@functools.lru_cache(maxsize=None)
def _wmedian_dispatch(out_hw, hsz, sigma_i, interpret):
    """custom_vmap wrapper per static configuration.

    ``jax.vmap`` of a pallas_call with ANY-memory-space inputs is not
    lowerable on TPU (the auto-batching rule emits squeezed block specs on
    HBM refs), so batching is claimed here instead: the vmap rule stacks the
    batch into the kernel's leading GRID axis — one compiled program, B x
    n_row x n_col programs, identical per-tile work.
    """
    call = functools.partial(
        _wmedian_call, out_hw=out_hw, hsz=hsz, sigma_i=sigma_i, interpret=interpret
    )

    @jax.custom_batching.custom_vmap
    def wm(u, v, occ, color):
        return call(u[None], v[None], occ[None], color[None])[0]

    @wm.def_vmap
    def _rule(axis_size, in_batched, u, v, occ, color):
        args = [
            x if bat else jnp.broadcast_to(x, (axis_size, *x.shape))
            for x, bat in zip((u, v, occ, color), in_batched)
        ]
        return call(*args), True

    return wm


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def wmedian_pallas(
    u_pad,
    v_pad,
    occ_pad,
    color_pad_cmajor,
    out_hw,
    area_hsz: int,
    sigma_i: float,
    interpret: bool = False,
):
    """Weighted median of both flow fields over (2h+1)^2 patches.

    Args:
        u_pad, v_pad, occ_pad: mirror-padded (H+2h, W+2h) float32 fields.
        color_pad_cmajor: (C, H+2h, W+2h) float32 padded guide image.
        out_hw: static (H, W) output size.
    Returns (H, W, 2) medians.  vmap-safe (see :func:`_wmedian_dispatch`).
    """
    H, W = out_hw
    hsz = int(area_hsz)
    tile_w = _pick_tile_w(W, hsz, color_pad_cmajor.shape[0])
    col_window = tile_w + _COL_PAD
    n_row = -(-H // TILE_H)
    n_col = -(-W // tile_w)
    Hp = n_row * TILE_H + (_ROW_WINDOW - TILE_H)
    Wp = (n_col - 1) * tile_w + col_window

    def fit(x, axes):
        cfg = [(0, 0)] * x.ndim
        for ax, target in axes:
            cfg[ax] = (0, max(0, target - x.shape[ax]))
        return jnp.pad(x, cfg)

    u_pad = fit(u_pad, [(-2, Hp), (-1, Wp)])
    v_pad = fit(v_pad, [(-2, Hp), (-1, Wp)])
    occ_pad = fit(occ_pad, [(-2, Hp), (-1, Wp)])
    color_pad_cmajor = fit(color_pad_cmajor, [(-2, Hp), (-1, Wp)])

    dispatch = _wmedian_dispatch((H, W), hsz, float(sigma_i), bool(interpret))
    return dispatch(u_pad, v_pad, occ_pad, color_pad_cmajor)


def wmedian_pallas_ok(H, W, hsz, C, budget_bytes: int = _VMEM_BUDGET) -> bool:
    """True when the kernel's static window/scratch configuration applies."""
    if TILE_H + 2 * hsz > _ROW_WINDOW or 2 * hsz > _COL_PAD:
        return False
    return _tile_bytes(_pick_tile_w(W, hsz, C), hsz, C) <= budget_bytes
