"""Reference-compatible import path for the penalty kernels.

Re-exports :mod:`optical_flow_tpu.ops.penalties` under the reference's
``robust.penalties`` module path (``robust/penalties.py``).
"""
from optical_flow_tpu.ops.penalties import (  # noqa: F401
    PENALTIES,
    charbonnier,
    gaussian,
    geman_mcclure,
    generalized_charbonnier,
    huber,
    lorentzian,
    mixture,
    quadratic,
    spline_penalty,
    tdist,
    tdist_unnorm,
    tukey,
)
