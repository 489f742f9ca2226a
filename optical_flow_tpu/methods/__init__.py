from optical_flow_tpu.methods.base import BaseOpticalFlow
from optical_flow_tpu.methods.hs import HSOpticalFlow
from optical_flow_tpu.methods.ba import BAOpticalFlow
from optical_flow_tpu.methods.classic_nl import ClassicNLOpticalFlow
from optical_flow_tpu.methods.alt_ba import AltBAOpticalFlow

__all__ = [
    "BaseOpticalFlow",
    "HSOpticalFlow",
    "BAOpticalFlow",
    "ClassicNLOpticalFlow",
    "AltBAOpticalFlow",
]
