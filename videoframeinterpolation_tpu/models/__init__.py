"""Model registry (reference ``models/__init__.py`` exposes models by name).

Reference-compatible names are aliased so reference configs
(``model_name: DATwConstantnCv1``) resolve unchanged.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import Config
from .dat import DATwConstantnC, dat_loss
from .ifrnet import IFRNet, ifrnet_loss
from . import base

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": None}


def _build_dat(cfg: Config):
    return DATwConstantnC(
        nf=cfg.nf,
        enc_res_blocks=cfg.enc_res_blocks,
        dec_res_blocks=cfg.dec_res_blocks,
        mlp_ratio=cfg.mlp_ratio,
        dtype=_DTYPES[cfg.compute_dtype],
    )


def _build_ifrnet(cfg: Config):
    return IFRNet(dtype=_DTYPES[cfg.compute_dtype])


MODEL_REGISTRY: dict[str, Any] = {
    "DATwConstantnC": _build_dat,
    "DATwConstantnCv1": _build_dat,  # reference name (models/__init__.py:10)
    "IFRNet": _build_ifrnet,
}


def create_model(cfg: Config):
    try:
        return MODEL_REGISTRY[cfg.model_name](cfg)
    except KeyError:
        raise ValueError(
            f"unknown model {cfg.model_name!r}; "
            f"available: {sorted(MODEL_REGISTRY)}"
        ) from None


__all__ = [
    "DATwConstantnC",
    "IFRNet",
    "dat_loss",
    "ifrnet_loss",
    "create_model",
    "MODEL_REGISTRY",
    "base",
]
