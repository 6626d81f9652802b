"""Logging / visualization utilities."""

from .flow_viz import flow_to_image, flow_tensor_to_np
from .logger import Logger

__all__ = ["flow_to_image", "flow_tensor_to_np", "Logger"]
