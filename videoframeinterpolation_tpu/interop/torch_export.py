"""Export flax param trees to reference (PyTorch) ``state_dict`` layout.

The exact inverse of :mod:`interop.torch_weights` (every mapping there is
a pure permutation — transposes, spatial flips, channel repacks — so the
inverse is unambiguous and the round trip is bit-exact; locked by
``tests/test_torch_export.py``). Output is a flat ``{name: np.ndarray}``
in the reference's own key layout: call ``{k: torch.from_numpy(v) for
...}`` and ``net.load_state_dict(...)`` to evaluate a TPU-trained
checkpoint in the reference stack (``/root/reference/evaluate.py:213-246``
— the other half of BASELINE.md's "same checkpoints" goal; import covers
torch->flax, this covers flax->torch).

Model coverage mirrors the importer: archive IFRNet
(``/root/reference/models/archive/IFRNet.py:54-233``) and the flagship
``DATwConstantnCv1`` (``/root/reference/models/DAT.py:14-38``). Only
reference-parity architectures export (a flagship with shared offsets /
reduced samples has no reference counterpart to load it).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "ifrnet_state_dict_from_params",
    "dat_state_dict_from_params",
]


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _inv_conv_kernel(k) -> np.ndarray:
    """flax (kh, kw, I, O) -> torch Conv2d (O, I, kh, kw)."""
    return np.ascontiguousarray(_np(k).transpose(3, 2, 0, 1))


def _inv_conv_transpose_kernel(k) -> np.ndarray:
    """flax ConvTranspose (kh, kw, I, O) -> torch (I, O, kh, kw), unflipped."""
    k = _np(k).transpose(2, 3, 0, 1)  # (I, O, kh, kw), still flipped
    return np.ascontiguousarray(k[:, :, ::-1, ::-1])


def _inv_dense_kernel(k) -> np.ndarray:
    """flax Dense (I, O) -> torch 1x1 Conv2d (O, I, 1, 1)."""
    return np.ascontiguousarray(_np(k).transpose(1, 0)[:, :, None, None])


def _conv(out: dict, prefix: str, p: Mapping) -> None:
    out[prefix + ".weight"] = _inv_conv_kernel(p["kernel"])
    if "bias" in p:
        out[prefix + ".bias"] = _np(p["bias"])


def _conv_t(out: dict, prefix: str, p: Mapping) -> None:
    out[prefix + ".weight"] = _inv_conv_transpose_kernel(p["kernel"])
    out[prefix + ".bias"] = _np(p["bias"])


def _dense_as_1x1(out: dict, prefix: str, p: Mapping) -> None:
    out[prefix + ".weight"] = _inv_dense_kernel(p["kernel"])
    out[prefix + ".bias"] = _np(p["bias"])


def _prelu(out: dict, key: str, p: Mapping) -> None:
    out[key] = _np(p["alpha"])


def _conv_prelu(out: dict, prefix: str, p: Mapping) -> None:
    _conv(out, prefix + ".0", p["conv"])
    _prelu(out, prefix + ".1.weight", p["prelu"])


def _res_block(out: dict, prefix: str, p: Mapping) -> None:
    _conv(out, prefix + ".conv1", p["conv1"])
    _prelu(out, prefix + ".prelu.weight", p["prelu"])
    _conv(out, prefix + ".conv2", p["conv2"])


def _half_channel_res_block(out: dict, prefix: str, p: Mapping) -> None:
    _conv(out, prefix + ".conv1.0", p["conv1"])
    _prelu(out, prefix + ".conv1.1.weight", p["prelu1"])
    _conv(out, prefix + ".conv2.0", p["conv2"])
    _prelu(out, prefix + ".conv2.1.weight", p["conv2_prelu"])
    _conv(out, prefix + ".conv3.0", p["conv3"])
    _prelu(out, prefix + ".conv3.1.weight", p["prelu3"])
    _conv(out, prefix + ".conv4.0", p["conv4"])
    _prelu(out, prefix + ".conv4.1.weight", p["conv4_prelu"])
    _conv(out, prefix + ".conv5", p["conv5"])
    if "prelu5" in p:
        _prelu(out, prefix + ".prelu.weight", p["prelu5"])


# ---------------------------------------------------------------- IFRNet


def ifrnet_state_dict_from_params(params: Mapping) -> dict:
    """``models.ifrnet.IFRNet`` params -> archive IFRNet state dict
    (inverse of ``torch_weights.ifrnet_params_from_state_dict``)."""
    out: dict = {}
    enc = params["encoder"]
    for i in range(1, 5):
        _conv_prelu(out, f"encoder.pyramid{i}.0", enc[f"p{i}_down"])
        _conv_prelu(out, f"encoder.pyramid{i}.1", enc[f"p{i}_conv"])
    for n in range(1, 5):
        dec = params[f"decoder{n}"]
        _conv_prelu(out, f"decoder{n}.convblock.0", dec["conv_in"])
        _half_channel_res_block(
            out, f"decoder{n}.convblock.1", dec["resblock"])
        _conv_t(out, f"decoder{n}.convblock.2", dec["up"])
    return out


# -------------------------------------------------------------- flagship


def _encoder_sd(out: dict, p: Mapping, prefix: str = "feature_encoder") -> None:
    pre = prefix + "."
    _conv(out, pre + "projection.0", p["proj_in"]["conv"])
    _prelu(out, pre + "projection.1.weight", p["proj_in"]["prelu"])
    _conv(out, pre + "projection.2", p["proj_down"]["conv"])
    _prelu(out, pre + "projection.3.weight", p["proj_down"]["prelu"])
    if "proj_res" in p:
        for name, blk in p["proj_res"].items():
            i = int(name.removeprefix("block"))
            _res_block(out, pre + f"projection.{4 + i}", blk)
    for lv in (2, 3, 4):
        _conv(out, pre + f"fea_L{lv}_conv.0", p[f"l{lv}_down"]["conv"])
        _prelu(out, pre + f"fea_L{lv}_conv.1.weight", p[f"l{lv}_down"]["prelu"])
        _conv(out, pre + f"fea_L{lv}_conv.2", p[f"l{lv}_conv"]["conv"])
        _prelu(out, pre + f"fea_L{lv}_conv.3.weight", p[f"l{lv}_conv"]["prelu"])


def _generator_sd(out: dict, p: Mapping, prefix: str = "pixel_geneartor") -> None:
    pre = prefix + "."
    for name, blk in p["reconstruction"].items():
        i = int(name.removeprefix("block"))
        _res_block(out, pre + f"reconstruction.{i}", blk)
    _conv(out, pre + "upconv1", p["upconv1"])
    _prelu(out, pre + "prelu1.weight", p["prelu1"])
    _conv(out, pre + "HRconv", p["hrconv"])
    _prelu(out, pre + "prelu2.weight", p["prelu2"])
    _conv(out, pre + "conv_last", p["conv_last"])


def _attn_sd(out: dict, p: Mapping, prefix: str) -> None:
    for name in ("q_proj", "k_proj", "v_proj"):
        _dense_as_1x1(out, prefix + "." + name, p[name])


def _dat_block_sd(out: dict, p: Mapping, prefix: str) -> None:
    pre = prefix + "."
    _conv_prelu(out, pre + "movement_extractor.0", p["movement_conv1"])
    _conv_prelu(out, pre + "movement_extractor.1", p["movement_conv2"])
    _half_channel_res_block(out, pre + "movement_extractor.2",
                            p["movement_res"])
    _conv(out, pre + "conv_res_offset", p["conv_res_offset"])
    _attn_sd(out, p["attn"], pre + "attn")
    _dense_as_1x1(out, pre + "mlp.fc1", p["mlp"]["fc1"])
    _dense_as_1x1(out, pre + "mlp.fc2", p["mlp"]["fc2"])
    if "conv_res_flow" in p:
        _conv_t(out, pre + "conv_res_flow", p["conv_res_flow"])


def _dcn_sd(out: dict, p: Mapping, prefix: str, k: int = 3) -> None:
    """Inverse of ``torch_weights._dcn_params`` (offset-channel repack and
    grouped-weight reshape are permutations; invert them exactly)."""
    pre = prefix + "."
    KK = k * k
    w = _np(p["om_out"]["kernel"])  # (3, 3, I, 3*G*KK), OUR channel order
    b = _np(p["om_out"]["bias"])
    G = w.shape[-1] // (3 * KK)
    perm = np.empty(3 * G * KK, np.int64)
    for g in range(G):
        for tap in range(KK):
            base = 2 * (g * KK + tap)
            perm[g * 3 * KK + 0 * KK + tap] = base + 1
            perm[g * 3 * KK + 1 * KK + tap] = base
            perm[g * 3 * KK + 2 * KK + tap] = 2 * G * KK + g * KK + tap
    inv = np.argsort(perm)
    out[pre + "conv_offset_mask.4.weight"] = _inv_conv_kernel(w[..., inv])
    out[pre + "conv_offset_mask.4.bias"] = b[inv]

    rw = _np(p["weight"])  # (G, KK, Cg, CoutG)
    G_, KK_, Cg, CoutG = rw.shape
    rw = rw.reshape(G_, k, k, Cg, CoutG).transpose(0, 4, 3, 1, 2).reshape(
        G_ * CoutG, Cg, k, k
    )
    out[pre + "regular_conv.weight"] = np.ascontiguousarray(rw)
    out[pre + "regular_conv.bias"] = _np(p["bias"])

    _conv(out, pre + "offset_flow_conv", p["offset_flow_conv"])
    _conv(out, pre + "conv_offset_mask.0", p["om1"]["conv"])
    _prelu(out, pre + "conv_offset_mask.1.weight", p["om1"]["prelu"])
    _conv(out, pre + "conv_offset_mask.2", p["om2"]["conv"])
    _prelu(out, pre + "conv_offset_mask.3.weight", p["om2"]["prelu"])


def _query_builder_sd(out: dict, p: Mapping,
                      prefix: str = "coarse_query_builder") -> None:
    pre = prefix + "."
    _conv(out, pre + "convblock.0", p["motion1"]["conv"])
    _prelu(out, pre + "convblock.1.weight", p["motion1"]["prelu"])
    _conv(out, pre + "convblock.2", p["motion2"]["conv"])
    _prelu(out, pre + "convblock.3.weight", p["motion2"]["prelu"])
    _dcn_sd(out, p["dcnt0"], pre + "dcnt0")
    _dcn_sd(out, p["dcnt1"], pre + "dcnt1")
    _conv(out, pre + "blendblock.0", p["blend1"]["conv"])
    _prelu(out, pre + "blendblock.1.weight", p["blend1"]["prelu"])
    _conv(out, pre + "blendblock.2", p["blend2"])


def dat_state_dict_from_params(params: Mapping) -> dict:
    """``DATwConstantnC`` params -> flagship ``DATwConstantnCv1`` state dict
    (inverse of ``torch_weights.dat_params_from_state_dict``).

    The params must be a reference-parity architecture (no shared offsets,
    reference sample counts); train with ``configs/DAT.yaml`` (and
    evaluate the exported checkpoint with ``ref_offset_units`` semantics —
    the reference's sampler divides x-displacements by 4,
    ``modules/deformable_attn.py:94-95``).
    """
    out: dict = {}
    _encoder_sd(out, params["feature_encoder"])
    _query_builder_sd(out, params["coarse_query_builder"])
    _conv_t(out, "lv4_to_lv3", params["lv4_to_lv3"])
    _dat_block_sd(out, params["dat_lv3"], "dat_lv3")
    _conv_t(out, "lv3_to_lv2", params["lv3_to_lv2"])
    _dat_block_sd(out, params["dat_lv2"], "dat_lv2")
    _conv_t(out, "lv2_to_lv1", params["lv2_to_lv1"])
    _dat_block_sd(out, params["dat_lv1"], "dat_lv1")
    _generator_sd(out, params["pixel_generator"])
    return out
