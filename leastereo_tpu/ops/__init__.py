from .convbr import ConvBR, conv_init
from .cost_volume import build_cost_volume
from .resize import (
    interp_matrix,
    resize2d,
    resize3d,
    scale_dimension,
    upsample2x_2d,
    upsample2x_3d,
)
from .softargmin import disparity_entropy, soft_argmin, soft_argmin_fast

__all__ = [
    "ConvBR",
    "conv_init",
    "build_cost_volume",
    "interp_matrix",
    "resize2d",
    "resize3d",
    "scale_dimension",
    "upsample2x_2d",
    "upsample2x_3d",
    "disparity_entropy",
    "soft_argmin",
    "soft_argmin_fast",
]
