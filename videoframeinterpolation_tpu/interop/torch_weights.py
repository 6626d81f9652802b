"""Convert reference (PyTorch) ``state_dict`` weights to flax param trees.

Pure numpy — accepts a mapping of parameter name -> array-like (call
``{k: v.numpy() for k, v in sd.items()}`` on a torch ``state_dict`` first,
or pass tensors directly; ``np.asarray`` handles both).

Layout rules (verified numerically against torch, see
``tests/test_reference_parity.py``):

* ``Conv2d.weight``  (O, I, kh, kw)   -> flax ``nn.Conv`` kernel
  (kh, kw, I, O): transpose only, both are cross-correlations.
* ``ConvTranspose2d.weight`` (I, O, kh, kw) -> flax ``nn.ConvTranspose``
  kernel (kh, kw, I, O): spatial FLIP then transpose —
  ``lax.conv_transpose`` does not flip the kernel while torch's
  transposed conv is the gradient of a (flipped) conv.
* ``PReLU.weight`` (C,) -> ``alpha`` unchanged.
* 1x1 ``Conv2d`` used as a linear projection -> flax ``nn.Dense`` kernel
  (I, O): squeeze spatial dims and transpose.

Model coverage:

* :func:`ifrnet_params_from_state_dict` — full archive IFRNet
  (``/root/reference/models/archive/IFRNet.py:54-233``); function-exact
  (the rebuilt model computes the same function, parity-tested to ~1e-5).
* :func:`dat_params_from_state_dict` — the flagship ``DATwConstantnCv1``
  (``/root/reference/models/DAT.py:14-38``). Encoder, lvN-to-lvM
  transposed convs, DAT attention/MLP/movement weights and the generator
  transfer function-exactly. Two documented deviations mean a transferred
  flagship is NOT bit-parity end to end (REBUILD_NOTES.md):
  the deformable-attention sampler here uses symmetric pixel units while
  the reference divides x-displacements by 4
  (``modules/deformable_attn.py:94-95``), and the DCN offset channel
  packing differs (``modules/dcnv2.py:54-57``) — the DCN head weights are
  repacked exactly (permutation only), but the sampler-unit difference
  remains. Use for warm-starting, not for checkpoint-parity evaluation.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "conv_kernel",
    "conv_transpose_kernel",
    "ifrnet_params_from_state_dict",
    "dat_params_from_state_dict",
    "same_channel_encoder_params",
    "generator_params",
    "attn_params",
    "dat_block_params",
]


def _np(v) -> np.ndarray:
    arr = np.asarray(v if not hasattr(v, "detach") else v.detach().cpu().numpy())
    return arr.astype(np.float32)


def conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def conv_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, I, O), spatially flipped."""
    w = _np(w)
    return np.ascontiguousarray(w[:, :, ::-1, ::-1]).transpose(2, 3, 0, 1)


def dense_kernel(w) -> np.ndarray:
    """torch 1x1 Conv2d weight (O, I, 1, 1) -> flax Dense kernel (I, O)."""
    return _np(w)[:, :, 0, 0].transpose(1, 0)


def _conv(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": conv_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv_t(sd: Mapping, prefix: str) -> dict:
    return {
        "kernel": conv_transpose_kernel(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _prelu(sd: Mapping, key: str) -> dict:
    return {"alpha": _np(sd[key])}


def _conv_prelu(sd: Mapping, prefix: str) -> dict:
    """torch ``Sequential(Conv2d, PReLU)`` -> flax ``ConvPReLU``."""
    return {
        "conv": _conv(sd, prefix + ".0"),
        "prelu": _prelu(sd, prefix + ".1.weight"),
    }


def _res_block(sd: Mapping, prefix: str) -> dict:
    """``ResBlocknoBN`` (conv1/prelu/conv2) -> flax ``ResBlock``."""
    return {
        "conv1": _conv(sd, prefix + ".conv1"),
        "prelu": _prelu(sd, prefix + ".prelu.weight"),
        "conv2": _conv(sd, prefix + ".conv2"),
    }


def _half_channel_res_block(sd: Mapping, prefix: str) -> dict:
    """``HalfChannelConv5ResBlock`` -> flax twin.

    Covers both variants: ``modules/basic_blocks.py:44-73`` (always has a
    final ``prelu``) and the archive IFRNet ResBlock with
    ``act_at_last=True`` (``models/archive/IFRNet.py:18-51`` — no final
    activation, so no ``prelu`` key in the state dict).
    """
    out = {
        "conv1": _conv(sd, prefix + ".conv1.0"),
        "prelu1": _prelu(sd, prefix + ".conv1.1.weight"),
        "conv2": _conv(sd, prefix + ".conv2.0"),
        "conv2_prelu": _prelu(sd, prefix + ".conv2.1.weight"),
        "conv3": _conv(sd, prefix + ".conv3.0"),
        "prelu3": _prelu(sd, prefix + ".conv3.1.weight"),
        "conv4": _conv(sd, prefix + ".conv4.0"),
        "conv4_prelu": _prelu(sd, prefix + ".conv4.1.weight"),
        "conv5": _conv(sd, prefix + ".conv5"),
    }
    if prefix + ".prelu.weight" in sd:
        out["prelu5"] = _prelu(sd, prefix + ".prelu.weight")
    return out


# ---------------------------------------------------------------- IFRNet


def ifrnet_params_from_state_dict(sd: Mapping) -> dict:
    """Archive IFRNet state dict -> params for ``models.ifrnet.IFRNet``.

    Key map: ``encoder.pyramid{n}.{0,1}`` (convrelu pairs,
    ``models/archive/IFRNet.py:56-79``) and ``decoder{n}.convblock.{0,1,2}``
    = convrelu / ResBlock(side 32, act_at_last=True) / ConvTranspose2d
    (``:82-147``).
    """
    sd = {k: _np(v) for k, v in sd.items()}
    encoder = {}
    for i in range(1, 5):
        encoder[f"p{i}_down"] = _conv_prelu(sd, f"encoder.pyramid{i}.0")
        encoder[f"p{i}_conv"] = _conv_prelu(sd, f"encoder.pyramid{i}.1")

    params = {"encoder": encoder}
    for n in range(1, 5):
        params[f"decoder{n}"] = {
            "conv_in": _conv_prelu(sd, f"decoder{n}.convblock.0"),
            "resblock": _half_channel_res_block(sd, f"decoder{n}.convblock.1"),
            "up": _conv_t(sd, f"decoder{n}.convblock.2"),
        }
    return params


# -------------------------------------------------------------- flagship


def same_channel_encoder_params(sd: Mapping, prefix: str = "feature_encoder") -> dict:
    """``SameChannelResEncoder`` (``modules/cnn_encoders.py:6-42``)."""
    p = prefix + "."
    n_res = len({k[len(p + "projection."):].split(".")[0]
                 for k in sd if k.startswith(p + "projection.")}
                - {"0", "1", "2", "3"})
    out = {
        "proj_in": {"conv": _conv(sd, p + "projection.0"),
                    "prelu": _prelu(sd, p + "projection.1.weight")},
        "proj_down": {"conv": _conv(sd, p + "projection.2"),
                      "prelu": _prelu(sd, p + "projection.3.weight")},
    }
    if n_res:
        out["proj_res"] = {
            f"block{i}": _res_block(sd, p + f"projection.{4 + i}")
            for i in range(n_res)
        }
    for lv in (2, 3, 4):
        out[f"l{lv}_down"] = {
            "conv": _conv(sd, p + f"fea_L{lv}_conv.0"),
            "prelu": _prelu(sd, p + f"fea_L{lv}_conv.1.weight"),
        }
        out[f"l{lv}_conv"] = {
            "conv": _conv(sd, p + f"fea_L{lv}_conv.2"),
            "prelu": _prelu(sd, p + f"fea_L{lv}_conv.3.weight"),
        }
    return out


def generator_params(sd: Mapping, prefix: str = "pixel_geneartor") -> dict:
    """``BasicResPixelShuffleGenerator`` (``modules/generator.py:7-24``).

    torch ``PixelShuffle(2)`` reads channel ``c*4 + dy*2 + dx`` for output
    channel ``c`` — our ``ops.pixel_shuffle`` matches that order, so
    ``upconv1`` transfers without repacking.
    """
    p = prefix + "."
    n_res = len({k[len(p + "reconstruction."):].split(".")[0]
                 for k in sd if k.startswith(p + "reconstruction.")})
    return {
        "reconstruction": {
            f"block{i}": _res_block(sd, p + f"reconstruction.{i}")
            for i in range(n_res)
        },
        "upconv1": _conv(sd, p + "upconv1"),
        "prelu1": _prelu(sd, p + "prelu1.weight"),
        "hrconv": _conv(sd, p + "HRconv"),
        "prelu2": _prelu(sd, p + "prelu2.weight"),
        "conv_last": _conv(sd, p + "conv_last"),
    }


def attn_params(sd: Mapping, prefix: str) -> dict:
    """``Attn`` q/k/v 1x1 convs (``modules/deformable_attn.py:10-40``) ->
    ``SampleAttention`` Dense kernels."""
    p = prefix + "."
    out = {}
    for name in ("q_proj", "k_proj", "v_proj"):
        out[name] = {
            "kernel": dense_kernel(sd[p + name + ".weight"]),
            "bias": _np(sd[p + name + ".bias"]),
        }
    return out


def dat_block_params(sd: Mapping, prefix: str, pred_res_flow: bool = True) -> dict:
    """``CrossDeformableAttentionBlockwFlow`` weights -> flax DAT block.

    All weights transfer 1:1; the remaining *functional* difference is the
    sampler's coordinate units (see module docstring).
    """
    p = prefix + "."
    out = {
        "movement_conv1": _conv_prelu(sd, p + "movement_extractor.0"),
        "movement_conv2": _conv_prelu(sd, p + "movement_extractor.1"),
        "movement_res": _half_channel_res_block(sd, p + "movement_extractor.2"),
        "conv_res_offset": _conv(sd, p + "conv_res_offset"),
        "attn": attn_params(sd, p + "attn"),
        "mlp": {
            "fc1": {"kernel": dense_kernel(sd[p + "mlp.fc1.weight"]),
                    "bias": _np(sd[p + "mlp.fc1.bias"])},
            "fc2": {"kernel": dense_kernel(sd[p + "mlp.fc2.weight"]),
                    "bias": _np(sd[p + "mlp.fc2.bias"])},
        },
    }
    if pred_res_flow:
        out["conv_res_flow"] = _conv_t(sd, p + "conv_res_flow")
    return out


def _dcn_params(sd: Mapping, prefix: str, groups: int = 8, k: int = 3) -> dict:
    """``DeformableConv2d`` (``modules/dcnv2.py:8-67``) -> flax DCN layer.

    The offset/mask head's final conv output channels are repacked from the
    reference/torchvision layout to our clean ``(G, 3, KK)`` layout:

    * reference conv channel ``c < 2*G*KK`` is (after the chunk-3 +
      flow-``flip(1)``-seeding dance, which concatenates back in original
      order) torchvision offset channel ``c``: group ``c // (2*KK)``, tap
      ``(c % (2*KK)) // 2``, **dy** if even else **dx**;
    * channel ``2*G*KK + m`` is the mask for group ``m // KK`` tap ``m % KK``.

    Ours orders ``g*(3*KK) + part*KK + tap`` with part 0=dx, 1=dy, 2=mask.
    The regular conv weight (O, I/G, k, k) becomes ``(G, KK, Cg, CoutG)``.
    """
    p = prefix + "."
    KK = k * k
    w = conv_kernel(sd[p + "conv_offset_mask.4.weight"])  # (3,3,I, 3*G*KK)
    b = _np(sd[p + "conv_offset_mask.4.bias"])
    G = w.shape[-1] // (3 * KK)
    perm = np.empty(3 * G * KK, np.int64)
    for g in range(G):
        for tap in range(KK):
            base = 2 * (g * KK + tap)
            perm[g * 3 * KK + 0 * KK + tap] = base + 1      # dx <- odd
            perm[g * 3 * KK + 1 * KK + tap] = base          # dy <- even
            perm[g * 3 * KK + 2 * KK + tap] = 2 * G * KK + g * KK + tap
    w = w[..., perm]
    b = b[perm]

    rw = _np(sd[p + "regular_conv.weight"])  # (O, Cg, k, k)
    O, Cg = rw.shape[0], rw.shape[1]
    CoutG = O // G
    # (O, Cg, kh, kw) -> (G, KK, Cg, CoutG)
    rw = rw.reshape(G, CoutG, Cg, k, k).transpose(0, 3, 4, 2, 1).reshape(
        G, KK, Cg, CoutG
    )
    return {
        "offset_flow_conv": _conv(sd, p + "offset_flow_conv"),
        # Sequential indices: 0 conv, 1 prelu, 2 conv, 3 prelu, 4 conv.
        "om1": {"conv": _conv(sd, p + "conv_offset_mask.0"),
                "prelu": _prelu(sd, p + "conv_offset_mask.1.weight")},
        "om2": {"conv": _conv(sd, p + "conv_offset_mask.2"),
                "prelu": _prelu(sd, p + "conv_offset_mask.3.weight")},
        "om_out": {"kernel": w, "bias": b},
        "weight": rw,
        "bias": _np(sd[p + "regular_conv.bias"]),
    }


def _query_builder_params(sd: Mapping, prefix: str = "coarse_query_builder") -> dict:
    """``DCNInterFeatBuilderwithT`` (``modules/query_builder.py:8-36``)."""
    p = prefix + "."
    return {
        # convblock/blendblock are FLAT Sequentials (conv, prelu, conv, ...).
        "motion1": {"conv": _conv(sd, p + "convblock.0"),
                    "prelu": _prelu(sd, p + "convblock.1.weight")},
        "motion2": {"conv": _conv(sd, p + "convblock.2"),
                    "prelu": _prelu(sd, p + "convblock.3.weight")},
        "dcnt0": _dcn_params(sd, p + "dcnt0"),
        "dcnt1": _dcn_params(sd, p + "dcnt1"),
        "blend1": {"conv": _conv(sd, p + "blendblock.0"),
                   "prelu": _prelu(sd, p + "blendblock.1.weight")},
        "blend2": _conv(sd, p + "blendblock.2"),
    }


def dat_params_from_state_dict(sd: Mapping) -> dict:
    """Flagship ``DATwConstantnCv1`` state dict -> ``DATwConstantnC`` params.

    See the module docstring for the two documented functional deviations
    that make this a warm-start (not bit-parity) transfer.
    """
    sd = {k: _np(v) for k, v in sd.items()}
    return {
        "feature_encoder": same_channel_encoder_params(sd),
        "coarse_query_builder": _query_builder_params(sd),
        "lv4_to_lv3": _conv_t(sd, "lv4_to_lv3"),
        "dat_lv3": dat_block_params(sd, "dat_lv3"),
        "lv3_to_lv2": _conv_t(sd, "lv3_to_lv2"),
        "dat_lv2": dat_block_params(sd, "dat_lv2"),
        "lv2_to_lv1": _conv_t(sd, "lv2_to_lv1"),
        "dat_lv1": dat_block_params(sd, "dat_lv1", pred_res_flow=False),
        "pixel_generator": generator_params(sd),
    }
