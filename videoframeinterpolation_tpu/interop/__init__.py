"""Interop with the upstream PyTorch reference framework.

Two pieces:

* :mod:`.torch_weights` — pure-numpy converters from reference
  ``state_dict`` layouts to this framework's flax parameter trees, so
  reference-trained checkpoints can be evaluated here (the ±0.05 dB
  PSNR-parity north star, BASELINE.md).
* :mod:`.torch_export` — the exact inverse: flax params back to
  reference ``state_dict`` layout, so TPU-trained checkpoints are
  evaluable by the reference stack (round-trip locked bit-exact in
  ``tests/test_torch_export.py``).
* :mod:`.reference_loader` — loads modules of the reference repository
  itself (PyTorch, CPU) as numerical oracles for parity tests, stubbing
  its CUDA-only dependencies (cupy, timm).
"""

from .torch_export import (
    dat_state_dict_from_params,
    ifrnet_state_dict_from_params,
)
from .torch_weights import (
    conv_kernel,
    conv_transpose_kernel,
    ifrnet_params_from_state_dict,
    dat_params_from_state_dict,
)

__all__ = [
    "conv_kernel",
    "conv_transpose_kernel",
    "ifrnet_params_from_state_dict",
    "dat_params_from_state_dict",
    "ifrnet_state_dict_from_params",
    "dat_state_dict_from_params",
]
