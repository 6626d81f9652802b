"""flax->torch reverse export (VERDICT r3 #4).

Two locks:

1. **Round trip is bit-exact**: torch state_dict -> flax params
   (importer) -> torch state_dict (exporter) reproduces every tensor
   byte-for-byte, for IFRNet and the flagship. This pins the converter
   pair against drift — any future layout change breaks one direction.
2. **flax->torch forward parity**: a RANDOM flax-initialized model,
   exported and loaded into the reference net (strict key match), computes
   the same function in torch — i.e. a TPU-trained checkpoint is
   evaluable by ``/root/reference/evaluate.py:213-246``.
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
    dat_state_dict_from_params,
    ifrnet_params_from_state_dict,
    ifrnet_state_dict_from_params,
)
from videoframeinterpolation_tpu.interop.reference_loader import (  # noqa: E402
    load_reference,
)

warnings.filterwarnings("ignore", category=FutureWarning)
warnings.filterwarnings("ignore", category=SyntaxWarning)

REF = load_reference()
pytestmark = pytest.mark.skipif(
    REF is None, reason="reference repo or torch unavailable"
)

RNG = np.random.default_rng(31)


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.ascontiguousarray(x_nchw.transpose(0, 2, 3, 1)))


def _nchw(x_nhwc) -> np.ndarray:
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def _perturb(net, scale=0.05, seed=9):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(scale * torch.randn_like(p))
    return net


def _assert_sd_bit_equal(sd_a: dict, sd_b: dict):
    assert set(sd_a) == set(sd_b), (
        set(sd_a) ^ set(sd_b)
    )
    for k in sd_a:
        np.testing.assert_array_equal(
            np.asarray(sd_a[k]), np.asarray(sd_b[k]), err_msg=k)


def test_ifrnet_round_trip_bit_exact():
    net = _perturb(REF.archive_ifrnet().IFRNet(types.SimpleNamespace()))
    sd = {k: v.numpy().astype(np.float32)
          for k, v in net.state_dict().items()}
    back = ifrnet_state_dict_from_params(ifrnet_params_from_state_dict(sd))
    _assert_sd_bit_equal(back, sd)


def test_dat_round_trip_bit_exact():
    args = types.SimpleNamespace(
        nf=24, enc_res_blocks=1, dec_res_blocks=1, mlp_ratio=2,
        distill_lambda=0.01,
    )
    net = _perturb(REF.dat().DATwConstantnCv1(args), scale=0.02)
    sd = {k: v.numpy().astype(np.float32)
          for k, v in net.state_dict().items()}
    back = dat_state_dict_from_params(dat_params_from_state_dict(sd))
    _assert_sd_bit_equal(back, sd)


def test_ifrnet_flax_to_torch_forward_parity():
    """A flax-initialized IFRNet exported into the reference net computes
    the same function — the 'evaluate a TPU checkpoint in torch' path."""
    from videoframeinterpolation_tpu.models.ifrnet import IFRNet

    B, H, W = 2, 64, 96
    x0 = RNG.random((B, 3, H, W), np.float32)
    x1 = RNG.random((B, 3, H, W), np.float32)
    t = np.full((B, 1), 0.5, np.float32)

    model = IFRNet()
    variables = model.init(
        jax.random.key(5), _nhwc(x0), _nhwc(x1),
        jnp.asarray(t.reshape(B, 1, 1, 1)),
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    yj = model.apply({"params": params}, _nhwc(x0), _nhwc(x1),
                     jnp.asarray(t.reshape(B, 1, 1, 1)))

    sd = {k: torch.from_numpy(v)
          for k, v in ifrnet_state_dict_from_params(params).items()}
    net = REF.archive_ifrnet().IFRNet(types.SimpleNamespace()).eval()
    net.load_state_dict(sd, strict=True)
    with torch.no_grad():
        yt = net({
            "x0": torch.from_numpy(x0 * 255.0),
            "x1": torch.from_numpy(x1 * 255.0),
            "t": torch.from_numpy(t),
        }).numpy()
    err = np.abs(_nchw(yj) - yt)
    assert err.max() < 1e-3 and err.mean() < 1e-5, (err.max(), err.mean())


def test_dat_flax_to_torch_forward_parity(monkeypatch):
    """Flax-initialized flagship (ref_offset_units) exported to torch:
    the reference net (numpy deform_conv2d oracle) computes the same
    frames."""
    from test_reference_parity import _patch_deform_conv2d

    from videoframeinterpolation_tpu.models import DATwConstantnC

    B, H, W = 1, 48, 64
    x0 = RNG.random((B, 3, H, W), np.float32)
    x1 = RNG.random((B, 3, H, W), np.float32)
    t = np.full((B, 1, 1, 1), 0.5, np.float32)

    model = DATwConstantnC(nf=24, enc_res_blocks=1, dec_res_blocks=1,
                           mlp_ratio=2.0, ref_offset_units=True)
    variables = model.init(jax.random.key(6), _nhwc(x0), _nhwc(x1),
                           jnp.asarray(t))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    yj = model.apply({"params": params}, _nhwc(x0), _nhwc(x1),
                     jnp.asarray(t))

    args = types.SimpleNamespace(
        nf=24, enc_res_blocks=1, dec_res_blocks=1, mlp_ratio=2,
        distill_lambda=0.01,
    )
    _patch_deform_conv2d(monkeypatch)
    net = REF.dat().DATwConstantnCv1(args).eval()
    sd = {k: torch.from_numpy(v)
          for k, v in dat_state_dict_from_params(params).items()}
    net.load_state_dict(sd, strict=True)
    with torch.no_grad():
        yt = net.inference(torch.from_numpy(x0), torch.from_numpy(x1),
                           torch.from_numpy(t)).numpy()
    err = np.abs(_nchw(yj) - yt)
    assert err.max() < 1e-3 and err.mean() < 1e-5, (err.max(), err.mean())


def test_convert_cli_rejects_non_flagship_dat_variants():
    """Registry-exact routing (ADVICE r4): DCNDATv1 / MADATv1 /
    DATwConstantnCTPU contain 'DAT' but have no converter — they must get
    the clean SystemExit, not a KeyError deep inside the param mapper."""
    import importlib.util
    from pathlib import Path

    import pytest

    from videoframeinterpolation_tpu.config import Config

    spec = importlib.util.spec_from_file_location(
        "convert_ckpt",
        Path(__file__).resolve().parents[1] / "convert_ckpt.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for name in ("DCNDATv1", "MADATv1", "DATwConstantnCTPU", "RSTTv1"):
        with pytest.raises(SystemExit, match="no converter"):
            mod._check_exportable(Config(model_name=name), to_torch=True)
    # The two supported families still route (flagship alias + canonical).
    assert mod._check_exportable(
        Config(model_name="IFRNet"), to_torch=True) == "ifrnet"
    for flag in ("DATwConstantnCv1", "DATwConstantnC"):
        cfg = Config(model_name=flag, dat_ref_offset_units=True)
        assert mod._check_exportable(cfg, to_torch=True) == "dat"
