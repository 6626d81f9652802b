"""Pallas TPU kernels for the sampling hot path."""

from .window_sample import windowed_deformable_sample

__all__ = ["windowed_deformable_sample"]
