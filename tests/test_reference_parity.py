"""Architecture parity against the installed PyTorch reference (CPU oracle).

The north star (BASELINE.md) is Vimeo90K PSNR within 0.05 dB of the
reference *on the same checkpoints*. These tests prove the prerequisite:
with weights transferred via ``interop.torch_weights``, the rebuilt models
compute the same function as the reference modules
(``/root/reference/models/archive/IFRNet.py:54-233``, ``models/DAT.py:74-116``)
to fp32 accumulation noise. The reference is imported as an oracle
(``interop.reference_loader``), never copied.

The flagship's deformable sampler is covered two ways: component tests in
our default symmetric pixel units, and a full-model test with
``ref_offset_units=True`` emulating the reference's asymmetric x/4
normalization quirk (``modules/deformable_attn.py:94-95``) so the whole
pipeline — including the DCN query builder, driven through a numpy
implementation of torchvision's ``deform_conv2d`` semantics — matches end
to end.
"""

import types
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from videoframeinterpolation_tpu.interop import (  # noqa: E402
    dat_params_from_state_dict,
    ifrnet_params_from_state_dict,
)
from videoframeinterpolation_tpu.interop import torch_weights as tw  # noqa: E402
from videoframeinterpolation_tpu.interop.reference_loader import (  # noqa: E402
    load_reference,
)

warnings.filterwarnings("ignore", category=FutureWarning)
warnings.filterwarnings("ignore", category=SyntaxWarning)

REF = load_reference()
pytestmark = pytest.mark.skipif(
    REF is None, reason="reference repo or torch unavailable"
)

RNG = np.random.default_rng(7)


def _perturb(net, scale=0.05, seed=1):
    """Randomize weights beyond init (zero-init heads become non-trivial)."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(scale * torch.randn_like(p))
    return net


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.ascontiguousarray(x_nchw.transpose(0, 2, 3, 1)))


def _nchw(x_nhwc) -> np.ndarray:
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


# ------------------------------------------------------------------ IFRNet


def test_ifrnet_full_forward_parity():
    net = _perturb(REF.archive_ifrnet().IFRNet(types.SimpleNamespace()).eval())
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = ifrnet_params_from_state_dict(sd)

    B, H, W = 2, 64, 96
    x0 = RNG.random((B, 3, H, W), np.float32)
    x1 = RNG.random((B, 3, H, W), np.float32)
    t = np.full((B, 1), 0.5, np.float32)

    with torch.no_grad():
        # the archive divides inputs by 255 internally (IFRNet.py:196)
        yt = net({
            "x0": torch.from_numpy(x0 * 255.0),
            "x1": torch.from_numpy(x1 * 255.0),
            "t": torch.from_numpy(t),
        }).numpy()

    from videoframeinterpolation_tpu.models.ifrnet import IFRNet

    yj = IFRNet().apply(
        {"params": params}, _nhwc(x0), _nhwc(x1),
        jnp.asarray(t.reshape(B, 1, 1, 1)),
    )
    err = np.abs(_nchw(yj) - yt)
    assert err.max() < 1e-3 and err.mean() < 1e-5, (err.max(), err.mean())


# ------------------------------------------------------- flagship components


def test_same_channel_encoder_parity():
    nf, n_res = 24, 2
    enc_t = _perturb(REF.cnn_encoders().SameChannelResEncoder(nf, n_res).eval())
    sd = {"feature_encoder." + k: v.numpy()
          for k, v in enc_t.state_dict().items()}
    params = tw.same_channel_encoder_params(sd)

    x = RNG.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        outs_t = enc_t(torch.from_numpy(x))

    from videoframeinterpolation_tpu.nn import SameChannelResEncoder

    outs_j = SameChannelResEncoder(nf, n_res).apply({"params": params}, _nhwc(x))
    for ot, oj in zip(outs_t, outs_j):
        err = np.abs(_nchw(oj) - ot.numpy())
        assert err.max() < 1e-4, err.max()


def test_generator_parity():
    nf, n_res = 24, 3
    gen_t = _perturb(
        REF.generator().BasicResPixelShuffleGenerator(nf, n_res).eval()
    )
    sd = {"pixel_geneartor." + k: v.numpy()
          for k, v in gen_t.state_dict().items()}
    params = tw.generator_params(sd)

    feat = RNG.standard_normal((2, nf, 16, 24)).astype(np.float32)
    mean = RNG.random((2, 1, 1, 1), np.float32)
    with torch.no_grad():
        yt = gen_t(torch.from_numpy(feat), torch.from_numpy(mean)).numpy()

    from videoframeinterpolation_tpu.nn import BasicResPixelShuffleGenerator

    yj = BasicResPixelShuffleGenerator(nf, n_res).apply(
        {"params": params}, _nhwc(feat), jnp.asarray(mean.transpose(0, 2, 3, 1))
    )
    err = np.abs(_nchw(yj) - yt)
    assert err.max() < 1e-4, err.max()


def test_attn_parity():
    in_c, out_c, nS, nH, H, W = 24, 24, 16, 4, 8, 12
    attn_t = _perturb(REF.deformable_attn().Attn(in_c, out_c, nS, nH).eval())
    sd = {"attn." + k: v.numpy() for k, v in attn_t.state_dict().items()}
    params = tw.attn_params(sd, "attn")

    q = RNG.standard_normal((2, in_c, H, W)).astype(np.float32)
    kv = RNG.standard_normal((2, in_c, nS, H * W)).astype(np.float32)
    with torch.no_grad():
        yt = attn_t(torch.from_numpy(q), torch.from_numpy(kv)).numpy()

    from videoframeinterpolation_tpu.nn.deformable_attn import SampleAttention

    # reference kv (B, C, S, H*W) -> ours (B, S, H*W, C)
    kv_j = jnp.asarray(kv.transpose(0, 2, 3, 1))
    yj = SampleAttention(out_c, nS, nH).apply({"params": params}, _nhwc(q), kv_j)
    err = np.abs(_nchw(yj) - yt)
    assert err.max() < 1e-4, err.max()


def test_dat_block_parity_y_only_flow():
    """Whole DAT block with y-only flows: the reference's x/4 quirk is
    inert for zero x displacement, so default symmetric units match."""
    nf, nS, nG, nH = 24, 8, 4, 4
    blk_t = _perturb(
        REF.deformable_attn().CrossDeformableAttentionBlockwFlow(
            nf, nf, n_samples=nS, n_groups=nG, n_heads=nH,
            mlp_ratio=2, offset_scale=2.0,
        ).eval(),
        scale=0.02,
    )
    # keep conv_res_offset zero-init (its output hits tanh -> offsets stay
    # exactly 0 so the sampling grid is flow-only = y-only)
    with torch.no_grad():
        blk_t.conv_res_offset.weight.zero_()
        blk_t.conv_res_offset.bias.zero_()
    sd = {"blk." + k: v.numpy() for k, v in blk_t.state_dict().items()}
    params = tw.dat_block_params(sd, "blk")

    B, H, W = 1, 12, 16
    feat_t = RNG.standard_normal((B, nf, H, W)).astype(np.float32)
    feat0 = RNG.standard_normal((B, nf, H, W)).astype(np.float32)
    feat1 = RNG.standard_normal((B, nf, H, W)).astype(np.float32)
    fl = np.zeros((B, 2, H, W), np.float32)
    fl0 = fl.copy()
    fl0[:, 1] = 1.5 * RNG.standard_normal((B, H, W)).astype(np.float32)
    fl1 = fl.copy()
    fl1[:, 1] = 1.5 * RNG.standard_normal((B, H, W)).astype(np.float32)

    with torch.no_grad():
        yt, up0_t, up1_t = blk_t(*map(torch.from_numpy,
                                      (feat_t, feat0, feat1, fl0, fl1)))

    from videoframeinterpolation_tpu.nn.deformable_attn import (
        CrossDeformableAttentionBlock,
    )

    blk_j = CrossDeformableAttentionBlock(
        features=nf, out_features=nf, n_samples=nS, n_groups=nG, n_heads=nH,
        mlp_ratio=2.0, offset_scale=2.0,
    )
    yj, up0_j, up1_j = blk_j.apply(
        {"params": params}, _nhwc(feat_t), _nhwc(feat0), _nhwc(feat1),
        _nhwc(fl0), _nhwc(fl1),
    )
    for a, b in ((yj, yt), (up0_j, up0_t), (up1_j, up1_t)):
        err = np.abs(_nchw(a) - b.numpy())
        assert err.max() < 2e-4, err.max()


# --------------------------------------------- full flagship (quirk emulated)


def _np_deform_conv2d_torchvision(x, offset, weight, bias, mask, padding):
    """torchvision.ops.deform_conv2d semantics, NCHW numpy (CPU oracle).

    offset: (B, 2*G*KK, H, W) interleaved (dy, dx) per tap, groups major;
    mask: (B, G*KK, H, W); weight: (O, I/g, K, K) — conv groups g inferred.
    Written from torchvision's op documentation, independent of both the
    reference and our jax kernel.
    """
    B, Cin, H, W = x.shape
    O, Cg, K, _ = weight.shape
    g = Cin // Cg
    G = offset.shape[1] // (2 * K * K)
    CinG = Cin // G
    out = np.zeros((B, O, H, W), np.float32)
    Og = O // g

    def sample(b, c, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        wy, wx = y - y0, x_ - x0
        v = 0.0
        for (yi, xi, wgt) in ((y0, x0, (1 - wy) * (1 - wx)),
                              (y0, x0 + 1, (1 - wy) * wx),
                              (y0 + 1, x0, wy * (1 - wx)),
                              (y0 + 1, x0 + 1, wy * wx)):
            if 0 <= yi < H and 0 <= xi < W:
                v += wgt * x[b, c, yi, xi]
        return v

    for b in range(B):
        for oy in range(H):
            for ox in range(W):
                # gather the deformed KxK patch for every input channel
                patch = np.zeros((Cin, K * K), np.float32)
                for ci in range(Cin):
                    og = ci // CinG  # offset group of this channel
                    for kh in range(K):
                        for kw in range(K):
                            k = kh * K + kw
                            dy = offset[b, 2 * (og * K * K + k), oy, ox]
                            dx = offset[b, 2 * (og * K * K + k) + 1, oy, ox]
                            m = mask[b, og * K * K + k, oy, ox]
                            sy = oy - padding + kh + dy
                            sx = ox - padding + kw + dx
                            patch[ci, k] = m * sample(b, ci, sy, sx)
                for co in range(O):
                    cg = co // Og  # conv group
                    w = weight[co]  # (Cg, K, K)
                    acc = 0.0
                    for ci_l in range(Cg):
                        ci = cg * Cg + ci_l
                        acc += float(
                            (w[ci_l].reshape(-1) * patch[ci]).sum()
                        )
                    out[b, co, oy, ox] = acc + bias[co]
    return out


def _patch_deform_conv2d(monkeypatch):
    import torchvision.ops as tv_ops

    def deform_conv2d(input, offset, weight, bias=None, stride=1, padding=0,
                      dilation=1, mask=None):
        pad = padding if isinstance(padding, int) else padding[0]
        out = _np_deform_conv2d_torchvision(
            input.detach().numpy(), offset.detach().numpy(),
            weight.detach().numpy(), bias.detach().numpy(),
            mask.detach().numpy(), pad,
        )
        return torch.from_numpy(out)

    monkeypatch.setattr(tv_ops, "deform_conv2d", deform_conv2d)


def test_flagship_full_forward_parity_ref_offset_units(monkeypatch):
    """Full DATwConstantnCv1 forward vs the rebuilt flagship with the
    reference's sampler units emulated — the executable statement of
    checkpoint-import parity (BASELINE.md north star)."""
    args = types.SimpleNamespace(
        nf=24, enc_res_blocks=1, dec_res_blocks=1, mlp_ratio=2,
        distill_lambda=0.01,
    )
    ref_dat = REF.dat()
    _patch_deform_conv2d(monkeypatch)
    net = _perturb(ref_dat.DATwConstantnCv1(args).eval(), scale=0.02)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = dat_params_from_state_dict(sd)

    B, H, W = 1, 48, 64
    x0 = RNG.random((B, 3, H, W), np.float32)
    x1 = RNG.random((B, 3, H, W), np.float32)
    t = np.full((B, 1, 1, 1), 0.5, np.float32)

    with torch.no_grad():
        yt = net.inference(torch.from_numpy(x0), torch.from_numpy(x1),
                           torch.from_numpy(t)).numpy()

    from videoframeinterpolation_tpu.models import DATwConstantnC

    model = DATwConstantnC(nf=24, enc_res_blocks=1, dec_res_blocks=1,
                           mlp_ratio=2.0, ref_offset_units=True)
    yj = model.apply({"params": params}, _nhwc(x0), _nhwc(x1),
                     jnp.asarray(t.reshape(B, 1, 1, 1)))
    err = np.abs(_nchw(yj) - yt)
    assert err.max() < 1e-3 and err.mean() < 1e-5, (err.max(), err.mean())
