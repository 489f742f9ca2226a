"""Flow plotting: color / quiver / magnitude / hsv styles.

Reference: ``viz/plot_flow.py:9-68``.  Forces the Agg backend (headless).
"""
from __future__ import annotations

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from optical_flow_tpu.viz.flow_color import flow_to_color  # noqa: E402

UNKNOWN_FLOW_THRESH = 1e9


def plot_flow(uv, style: str = "color", ax=None, max_flow=None, step: int = 1):
    """Plot an (H, W, 2) flow field; returns the matplotlib axes."""
    uv = np.asarray(uv)
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(8, 6))

    u = uv[:, :, 0].astype(float).copy()
    v = uv[:, :, 1].astype(float).copy()
    unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[unknown] = 0
    v[unknown] = 0

    if style == "color":
        ax.imshow(flow_to_color(uv, max_flow=max_flow))
        ax.set_title("Optical Flow (Color)")
    elif style == "quiver":
        H, W = u.shape
        Y, X = np.mgrid[0:H:step, 0:W:step]
        ax.quiver(X, Y, u[::step, ::step], v[::step, ::step], angles="xy")
        ax.set_ylim(H, 0)
        ax.set_xlim(0, W)
        ax.set_aspect("equal")
        ax.set_title("Optical Flow (Quiver)")
    elif style == "magnitude":
        ax.imshow(np.sqrt(u**2 + v**2), cmap="jet")
        ax.set_title("Flow Magnitude")
    elif style == "hsv":
        Hh, Ww = u.shape
        hsv = np.zeros((Hh, Ww, 3))
        mag = np.sqrt(u**2 + v**2)
        ang = np.arctan2(v, u)
        hsv[:, :, 0] = (ang + np.pi) / (2 * np.pi)
        hsv[:, :, 1] = 1.0
        max_mag = mag.max() if max_flow is None else max_flow
        hsv[:, :, 2] = np.clip(mag / max(max_mag, 1e-8), 0, 1)
        from matplotlib.colors import hsv_to_rgb

        ax.imshow(hsv_to_rgb(hsv))
        ax.set_title("Optical Flow (HSV)")
    else:
        raise ValueError(f"Unknown style: {style}")

    ax.axis("off")
    return ax
