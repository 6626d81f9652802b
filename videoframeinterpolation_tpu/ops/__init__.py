"""Pure-JAX compute ops: sampling, warping, splatting, DCN, losses."""

from .interp import (
    grid_sample,
    normalized_grid_sample,
    resize_bilinear,
    scale_resize,
)
from .warp import bwarp, fwarp, fwarp_mframes, fwarp_using_two_frames
from .windowed import windowed_deformable_sample
from .softsplat import softsplat, softsplat_raw
from .dcn import deform_conv2d
from .pixelshuffle import pixel_shuffle, pixel_unshuffle
from .losses import (
    charbonnier_ada,
    charbonnier_l1,
    geometry_loss,
    get_robust_weight,
    offset_fidelity_loss,
    ternary_loss,
)

__all__ = [
    "grid_sample",
    "normalized_grid_sample",
    "resize_bilinear",
    "scale_resize",
    "bwarp",
    "fwarp",
    "fwarp_mframes",
    "fwarp_using_two_frames",
    "windowed_deformable_sample",
    "softsplat",
    "softsplat_raw",
    "deform_conv2d",
    "pixel_shuffle",
    "pixel_unshuffle",
    "charbonnier_ada",
    "charbonnier_l1",
    "geometry_loss",
    "get_robust_weight",
    "offset_fidelity_loss",
    "ternary_loss",
]
