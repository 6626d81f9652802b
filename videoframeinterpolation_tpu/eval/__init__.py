"""Evaluation: metrics + benchmark loops."""

from .metrics import psnr, ssim_3d
from .benchmarks import (
    validate_snu, validate_synthetic, validate_ucf101, validate_vimeo90k,
)

__all__ = [
    "psnr",
    "ssim_3d",
    "validate_snu",
    "validate_synthetic",
    "validate_ucf101",
    "validate_vimeo90k",
]
