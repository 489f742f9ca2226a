"""Method configuration factory — named presets.

Reproduces every constant of the reference's ``load_of_method``
(``methods/config.py:10-176``): 11 named presets mapping to configured
method objects.
"""
from __future__ import annotations

import numpy as np

from optical_flow_tpu.ops.penalties import Robust

MEDIAN_FILTER_SIZE = [5, 5]


def load_of_method(method: str):
    """Load a pre-configured optical flow method by name.

    Available (reference ``config.py:13-24``): 'classic+nl-fast',
    'classic+nl', 'classic+nl-full', 'hs-brightness', 'hs', 'ba-brightness',
    'ba' / 'classic-l', 'classic-c-brightness', 'classic-c', 'classic++',
    'classic-c-a'.
    """
    if method == "classic+nl-fast":
        ope = load_of_method("classic+nl")
        ope.max_iters = 3
        ope.gnc_iters = 2
        ope.display = True
        return ope

    if method == "classic+nl":
        from optical_flow_tpu.methods.classic_nl import ClassicNLOpticalFlow

        ope = ClassicNLOpticalFlow()
        ope.texture = True
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.alp = 0.95
        ope.area_hsz = 7
        ope.sigma_i = 7
        ope.color_images = np.ones((1, 1, 3))
        ope.lambda_ = 3
        ope.lambda_q = 3
        return ope

    if method == "classic+nl-full":
        ope = load_of_method("classic+nl")
        ope.fullVersion = True
        return ope

    if method == "hs-brightness":
        from optical_flow_tpu.methods.hs import HSOpticalFlow

        ope = HSOpticalFlow()
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.lambda_ = 10
        ope.lambda_q = 10
        return ope

    if method == "hs":
        from optical_flow_tpu.methods.hs import HSOpticalFlow

        ope = HSOpticalFlow()
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.texture = True
        ope.lambda_ = 40
        ope.lambda_q = 40
        ope.display = True
        return ope

    if method == "ba-brightness":
        from optical_flow_tpu.methods.ba import BAOpticalFlow

        ope = BAOpticalFlow()
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        m = "lorentzian"
        ope.rho_spatial_u = [Robust(m, (0.1,)), Robust(m, (0.1,))]
        ope.rho_spatial_v = [Robust(m, (0.1,)), Robust(m, (0.1,))]
        ope.rho_data = Robust(m, (3.5,))
        ope.lambda_ = 0.045
        ope.lambda_q = 0.045
        return ope

    if method in ("classic-l", "ba"):
        ope = load_of_method("ba-brightness")
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.texture = True
        m = "lorentzian"
        ope.rho_spatial_u = [Robust(m, (0.03,)), Robust(m, (0.03,))]
        ope.rho_spatial_v = [Robust(m, (0.03,)), Robust(m, (0.03,))]
        ope.rho_data = Robust(m, (1.5,))
        ope.lambda_ = 0.06
        ope.lambda_q = 0.06
        return ope

    if method == "classic-c-a":
        from optical_flow_tpu.methods.alt_ba import AltBAOpticalFlow

        ope = AltBAOpticalFlow()
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.texture = True
        m = "charbonnier"
        ope.rho_spatial_u = [Robust(m, (1e-3,)), Robust(m, (1e-3,))]
        ope.rho_spatial_v = [Robust(m, (1e-3,)), Robust(m, (1e-3,))]
        ope.rho_data = Robust(m, (1e-3,))
        ope.display = False
        ope.lambda2 = 1e2
        ope.lambda3 = 1
        ope.weightRatio = ope.lambda2 / ope.lambda3
        ope.itersLO = 5
        ope.lambda_ = 5
        ope.lambda_q = 5
        return ope

    if method == "classic-c-brightness":
        from optical_flow_tpu.methods.ba import BAOpticalFlow

        ope = BAOpticalFlow()
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.texture = False
        m = "charbonnier"
        ope.rho_spatial_u = [Robust(m, (1e-3,)), Robust(m, (1e-3,))]
        ope.rho_spatial_v = [Robust(m, (1e-3,)), Robust(m, (1e-3,))]
        ope.rho_data = Robust(m, (1e-3,))
        ope.lambda_ = 3
        ope.lambda_q = 3
        return ope

    if method == "classic-c":
        ope = load_of_method("classic-c-brightness")
        ope.texture = True
        ope.lambda_ = 5
        ope.lambda_q = 5
        return ope

    if method == "classic++":
        from optical_flow_tpu.methods.ba import BAOpticalFlow

        ope = BAOpticalFlow()
        ope.median_filter_size = MEDIAN_FILTER_SIZE
        ope.texture = True
        ope.interpolation_method = "bi-cubic"
        m = "generalized_charbonnier"
        a = 0.45
        sig = 1e-3
        ope.rho_spatial_u = [Robust(m, (sig, a)), Robust(m, (sig, a))]
        ope.rho_spatial_v = [Robust(m, (sig, a)), Robust(m, (sig, a))]
        ope.rho_data = Robust(m, (sig, a))
        ope.lambda_ = 3
        ope.lambda_q = 3
        return ope

    raise ValueError(f"Unknown optical flow method: '{method}'")
