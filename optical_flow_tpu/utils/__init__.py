from optical_flow_tpu.utils.compat import (
    scale_image,
    fspecial_gaussian,
    matlab_round,
    rgb2gray,
    rgb2lab,
)

__all__ = [
    "scale_image",
    "fspecial_gaussian",
    "matlab_round",
    "rgb2gray",
    "rgb2lab",
]
