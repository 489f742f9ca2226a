"""Middlebury color coding for flow visualization.

Reference: ``viz/flow_color.py`` — 55-bin colorwheel (RY15, YG6, GC4, CB11,
BM13, MR6), interpolated hue, radius-saturated, >1 radius dimmed by 0.75,
unknown flow black.  Host-side numpy (visualization is not a device path).
"""
from __future__ import annotations

import numpy as np

UNKNOWN_FLOW_THRESH = 1e9


def make_colorwheel() -> np.ndarray:
    """(55, 3) RGB colorwheel in [0, 255]."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    cw = np.zeros((ncols, 3))
    col = 0
    cw[col : col + RY, 0] = 255
    cw[col : col + RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    cw[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    cw[col : col + YG, 1] = 255
    col += YG
    cw[col : col + GC, 1] = 255
    cw[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    cw[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    cw[col : col + CB, 2] = 255
    col += CB
    cw[col : col + BM, 2] = 255
    cw[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    cw[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    cw[col : col + MR, 0] = 255
    return cw


def compute_color(u, v) -> np.ndarray:
    """Color image (uint8) from normalized flow components."""
    u = np.asarray(u, dtype=float)
    v = np.asarray(v, dtype=float)
    cw = make_colorwheel()
    ncols = cw.shape[0]

    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2.0 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols] = 0
    f = fk - k0

    img = np.zeros((*u.shape, 3), dtype=np.uint8)
    for i in range(3):
        tmp = cw[k0, i] / 255.0 * (1 - f) + cw[k1, i] / 255.0 * f
        tmp = 1 - rad * (1 - tmp)
        tmp[rad > 1] = tmp[rad > 1] * 0.75
        img[:, :, i] = np.floor(255 * np.clip(tmp, 0, 1)).astype(np.uint8)
    return img


def flow_to_color(flow, max_flow=None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 Middlebury color image."""
    flow = np.asarray(flow)
    u = flow[:, :, 0].astype(float).copy()
    v = flow[:, :, 1].astype(float).copy()
    unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)

    if max_flow is not None:
        max_rad = max_flow
    else:
        known = ~unknown
        mag = np.sqrt(u[known] ** 2 + v[known] ** 2) if np.any(known) else np.array([0.0])
        max_rad = mag.max() if mag.size else 1.0
    max_rad = max(max_rad, 1e-8)

    img = compute_color(u / max_rad, v / max_rad)
    img[unknown] = 0
    return img
