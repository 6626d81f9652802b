"""Host-side data pipeline: readers, augmentations, datasets, loader."""

from .readers import read, read_flo, read_float3, read_image, read_pfm, write_flo
from .augment import random_augment
from .vimeo90k import Vimeo90K, Vimeo90KwFlow
from .synthetic import SyntheticMotion
from .loader import DataLoader
from .padder import InputPadder

DATASET_REGISTRY = {
    "Vimeo90K": Vimeo90K,
    "Vimeo90KwFlow": Vimeo90KwFlow,
    "SyntheticMotion": SyntheticMotion,
}

__all__ = [
    "read",
    "read_flo",
    "read_float3",
    "read_image",
    "read_pfm",
    "write_flo",
    "random_augment",
    "Vimeo90K",
    "Vimeo90KwFlow",
    "DataLoader",
    "InputPadder",
    "DATASET_REGISTRY",
]
