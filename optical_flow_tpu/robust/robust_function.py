"""RobustFunction: reference-compatible constructor surface.

``RobustFunction('lorentzian', 0.03)`` /
``RobustFunction('generalized_charbonnier', 1e-3, 0.45)`` — positional
parameters like the reference (``robust/robust_function.py:47-83``),
returning the frozen :class:`~optical_flow_tpu.ops.penalties.Robust`
descriptor used throughout this framework.
"""
from optical_flow_tpu.ops.penalties import PENALTIES as PENALTY_MAP
from optical_flow_tpu.ops.penalties import Robust, robust


def RobustFunction(method: str, *args) -> Robust:
    return robust(method, *args)


__all__ = ["RobustFunction", "PENALTY_MAP", "Robust"]
