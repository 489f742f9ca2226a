"""Method configuration factory — a declarative preset table.

Provides every named preset of the reference's ``load_of_method``
(``methods/config.py:10-176``) with identical constants, but as data rather
than an if-chain: each preset is (method class, optional base preset,
settings factory).  Base presets compose by applying the parent's settings
first — e.g. ``classic+nl-fast`` = ``classic+nl`` + a shorter schedule.
Settings are built fresh per call so loaded methods never share mutable
state.
"""
from __future__ import annotations

import numpy as np

from optical_flow_tpu.ops.penalties import Robust

MEDIAN_FILTER_SIZE = [5, 5]


def _penalties(name, spatial, data):
    """The three robust-penalty slots: two spatial (u, v) + one data term."""

    def r(p):
        return Robust(name, p if isinstance(p, tuple) else (p,))

    return {
        "rho_spatial_u": [r(spatial), r(spatial)],
        "rho_spatial_v": [r(spatial), r(spatial)],
        "rho_data": r(data),
    }


def _classic_nl():
    from optical_flow_tpu.methods.classic_nl import ClassicNLOpticalFlow

    return ClassicNLOpticalFlow()


def _hs():
    from optical_flow_tpu.methods.hs import HSOpticalFlow

    return HSOpticalFlow()


def _ba():
    from optical_flow_tpu.methods.ba import BAOpticalFlow

    return BAOpticalFlow()


def _alt_ba():
    from optical_flow_tpu.methods.alt_ba import AltBAOpticalFlow

    return AltBAOpticalFlow()


# name -> (constructor, base preset name or None, settings factory).
# Constants mirror the reference table exactly (methods/config.py:32-173),
# including its display defaults and the (1, 1, 3) color placeholder that
# flags "use the Lab guide when the input has color".
_PRESETS = {
    "classic+nl": (
        _classic_nl,
        None,
        lambda: {
            "texture": True,
            "median_filter_size": MEDIAN_FILTER_SIZE,
            "alp": 0.95,
            "area_hsz": 7,
            "sigma_i": 7,
            "color_images": np.ones((1, 1, 3)),
            "lambda_": 3,
            "lambda_q": 3,
        },
    ),
    "classic+nl-fast": (
        _classic_nl,
        "classic+nl",
        lambda: {"max_iters": 3, "gnc_iters": 2, "display": True},
    ),
    "classic+nl-full": (_classic_nl, "classic+nl", lambda: {"fullVersion": True}),
    "hs-brightness": (
        _hs,
        None,
        lambda: {"median_filter_size": MEDIAN_FILTER_SIZE, "lambda_": 10, "lambda_q": 10},
    ),
    "hs": (
        _hs,
        None,
        lambda: {
            "median_filter_size": MEDIAN_FILTER_SIZE,
            "texture": True,
            "lambda_": 40,
            "lambda_q": 40,
            "display": True,
        },
    ),
    "ba-brightness": (
        _ba,
        None,
        lambda: {
            "median_filter_size": MEDIAN_FILTER_SIZE,
            "lambda_": 0.045,
            "lambda_q": 0.045,
            **_penalties("lorentzian", 0.1, 3.5),
        },
    ),
    "ba": (
        _ba,
        "ba-brightness",
        lambda: {
            "texture": True,
            "lambda_": 0.06,
            "lambda_q": 0.06,
            **_penalties("lorentzian", 0.03, 1.5),
        },
    ),
    "classic-c-a": (
        _alt_ba,
        None,
        lambda: {
            "median_filter_size": MEDIAN_FILTER_SIZE,
            "texture": True,
            "display": False,
            "lambda2": 1e2,
            "lambda3": 1,
            "weightRatio": 1e2,  # lambda2 / lambda3
            "itersLO": 5,
            "lambda_": 5,
            "lambda_q": 5,
            **_penalties("charbonnier", 1e-3, 1e-3),
            # the reference's default classic-c-a config DIVERGES on real
            # frames (its own trajectory reaches max|uv| ~ 1e48 — see
            # tests/test_full_parity.py::test_alt_ba_divergence_parity*);
            # so this preset alone defaults the level-boundary recovery
            # guard ON at the metrics' unknown-flow sentinel (|f| < 1e9 is
            # scoreable by construction).  Pass {'guard_flow': None} to
            # reproduce the reference's divergence bit-for-bit (the parity
            # tests do).
            "guard_flow": 1e9,
        },
    ),
    "classic-c-brightness": (
        _ba,
        None,
        lambda: {
            "median_filter_size": MEDIAN_FILTER_SIZE,
            "texture": False,
            "lambda_": 3,
            "lambda_q": 3,
            **_penalties("charbonnier", 1e-3, 1e-3),
        },
    ),
    "classic-c": (
        _ba,
        "classic-c-brightness",
        lambda: {"texture": True, "lambda_": 5, "lambda_q": 5},
    ),
    "classic++": (
        _ba,
        None,
        lambda: {
            "median_filter_size": MEDIAN_FILTER_SIZE,
            "texture": True,
            "interpolation_method": "bi-cubic",
            "lambda_": 3,
            "lambda_q": 3,
            **_penalties("generalized_charbonnier", (1e-3, 0.45), (1e-3, 0.45)),
        },
    ),
}

_ALIASES = {"classic-l": "ba"}


def available_methods():
    """All preset names (aliases included), reference ``config.py:13-24``."""
    return sorted(_PRESETS) + sorted(_ALIASES)


def load_of_method(method: str):
    """Load a pre-configured optical flow method by name.

    Available (reference ``config.py:13-24``): 'classic+nl-fast',
    'classic+nl', 'classic+nl-full', 'hs-brightness', 'hs', 'ba-brightness',
    'ba' / 'classic-l', 'classic-c-brightness', 'classic-c', 'classic++',
    'classic-c-a'.
    """
    name = _ALIASES.get(method, method)
    if name not in _PRESETS:
        raise ValueError(f"Unknown optical flow method: '{method}'")
    ctor, base, settings = _PRESETS[name]
    ope = ctor()
    chain = []
    cur = name
    while cur is not None:
        chain.append(_PRESETS[cur][2])
        cur = _PRESETS[cur][1]
    for fn in reversed(chain):  # base settings first, leaf overrides last
        for key, val in fn().items():
            setattr(ope, key, val)
    return ope
