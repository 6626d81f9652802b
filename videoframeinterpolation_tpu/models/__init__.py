"""Model registry (reference ``models/__init__.py`` exposes models by name).

Reference-compatible names are aliased so reference configs resolve
unchanged. The reference exports only the flagship; its 12 archived variants
are registered here too as working rebuilds (the archive's broken imports
are repaired — see each model module's docstring).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import Config
from .dat import DATwConstantnC, dat_loss
from .ifrnet import IFRNet, ifrnet_loss
from .m2m import GMM2M, IFRM2M, m2m_loss
from .gmtrans import GMTrans, gmtrans_loss
from .rstt import RSTT, rstt_loss
from .dcntrans import DCNTrans, dcntrans_loss
from .dcndat import DCNDAT, dcndat_loss
from .madat import MADAT, madat_loss
from .gmbase import (
    FFCRAFT, GMVFIFormer, LAMAResidual, RAFTRefine,
    gmbase_loss, raftrefine_loss,
)
from .dat_tpu import DATwConstantnCTPU
from . import base
from .base import multi_t_apply

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": None}


def _dt(cfg: Config):
    return _DTYPES[cfg.compute_dtype]


MODEL_REGISTRY: dict[str, Any] = {
    # flagship (the only model the reference exports, models/__init__.py:10)
    "DATwConstantnC": lambda c: DATwConstantnC(
        nf=c.nf, enc_res_blocks=c.enc_res_blocks,
        dec_res_blocks=c.dec_res_blocks, mlp_ratio=c.mlp_ratio,
        window_sampling=c.window_sampling,
        shared_offsets=(tuple(c.shared_offsets)
                        if isinstance(c.shared_offsets, (list, tuple))
                        else c.shared_offsets),
        n_samples=tuple(c.dat_samples),
        attn_strides=tuple(c.dat_attn_stride),
        movement_nf=(tuple(c.dat_movement_nf)
                     if c.dat_movement_nf else None),
        ref_offset_units=c.dat_ref_offset_units,
        dtype=_dt(c)),
    # archive families (reference models/archive/)
    "IFRNet": lambda c: IFRNet(dtype=_dt(c)),
    "IFRM2M": lambda c: IFRM2M(n_branch=c.m2m_branch, dtype=_dt(c)),
    "GMM2M": lambda c: GMM2M(n_branch=c.m2m_branch, dtype=_dt(c)),
    "GMTrans": lambda c: GMTrans(dtype=_dt(c)),
    "RSTT": lambda c: RSTT(dtype=_dt(c)),
    "DCNTrans": lambda c: DCNTrans(
        nf=c.nf, enc_res_blocks=c.enc_res_blocks,
        dec_res_blocks=c.dec_res_blocks, mlp_ratio=c.mlp_ratio,
        dtype=_dt(c)),
    "DCNTransFwarp": lambda c: DCNTrans(
        nf=c.nf, enc_res_blocks=c.enc_res_blocks,
        dec_res_blocks=c.dec_res_blocks, mlp_ratio=c.mlp_ratio,
        use_fwarp=True, dtype=_dt(c)),
    "DCNDAT": lambda c: DCNDAT(
        nf=c.nf, enc_res_blocks=c.enc_res_blocks,
        dec_res_blocks=c.dec_res_blocks, mlp_ratio=c.mlp_ratio, dtype=_dt(c)),
    "MADAT": lambda c: MADAT(channels=tuple(c.channels),
                             depths=tuple(c.depths),
                             mlp_ratio=c.mlp_ratio, dtype=_dt(c)),
    "LAMAResidual": lambda c: LAMAResidual(dtype=_dt(c)),
    "FFCRAFT": lambda c: FFCRAFT(dtype=_dt(c)),
    "GMVFIFormer": lambda c: GMVFIFormer(dtype=_dt(c)),
    "RAFTRefine": lambda c: RAFTRefine(dtype=_dt(c)),
    # TPU-native flagship candidate (gather-free local-window attention).
    "DATwConstantnCTPU": lambda c: DATwConstantnCTPU(
        nf=c.nf, enc_res_blocks=c.enc_res_blocks,
        dec_res_blocks=c.dec_res_blocks, mlp_ratio=c.mlp_ratio,
        radii=tuple(c.radii),
        offset_sets=(tuple(tuple(o) for o in c.offset_sets)
                     if c.offset_sets is not None else None),
        n_offset_groups=tuple(c.n_offset_groups),
        dtype=_dt(c)),
}

# Reference model_name aliases (configs/*.yaml values).
_ALIASES = {
    "DATwConstantnCv1": "DATwConstantnC",
    "IFRM2Mv1": "IFRM2M",
    # v2 is a truncated sketch in the reference (forward ends mid-function,
    # models/archive/IFRM2M.py:243-256); configs/archive/IFRM2M.yaml names
    # it, so it resolves to the complete v1 semantics here.
    "IFRM2Mv2": "IFRM2M",
    "GMM2Mv1": "GMM2M",
    "GMTransv1": "GMTrans",
    "RSTTv1": "RSTT",
    "DCNTransv1": "DCNTrans",
    "DCNTransv2": "DCNTransFwarp",
    "DCNDATv1": "DCNDAT",
    "MADATv1": "MADAT",
    "GMVFIFormerV1": "GMVFIFormer",
}
for alias, target in _ALIASES.items():
    MODEL_REGISTRY[alias] = MODEL_REGISTRY[target]


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
    "IFRM2M",
    "GMM2M",
    "GMTrans",
    "RSTT",
    "DCNTrans",
    "DCNDAT",
    "MADAT",
    "LAMAResidual",
    "FFCRAFT",
    "GMVFIFormer",
    "RAFTRefine",
    "DATwConstantnCTPU",
    "multi_t_apply",
    "dat_loss",
    "ifrnet_loss",
    "m2m_loss",
    "gmtrans_loss",
    "rstt_loss",
    "dcntrans_loss",
    "dcndat_loss",
    "madat_loss",
    "gmbase_loss",
    "raftrefine_loss",
    "create_model",
    "MODEL_REGISTRY",
    "base",
]
