"""Li–Osher iterative median denoising (used by Alt-BA).

Reference: ``utils/denoising.py:6-30``.
"""
from __future__ import annotations

import numpy as np

from optical_flow_tpu.ops.filters import median_filter2d


def denoise_LO(un, mfsz, lambda_param, n_iters: int = 1):
    """u <- medfilt(u + lambda*(un - u)), iterated ``n_iters`` times."""
    if mfsz is None:
        return un
    if isinstance(mfsz, (list, tuple, np.ndarray)):
        fsz = (int(mfsz[0]), int(mfsz[1]))
    else:
        fsz = (int(mfsz), int(mfsz))
    u = un
    for _ in range(int(n_iters)):
        u_tilde = u + lambda_param * (un - u)
        u = median_filter2d(u_tilde, fsz, "reflect")
    return u
