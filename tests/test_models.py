"""Model smoke + behavior tests (tiny shapes, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.models.dat import DATwConstantnC, dat_loss
from videoframeinterpolation_tpu.models.ifrnet import IFRNet, ifrnet_loss


def _tiny_dat():
    # nf must be divisible by n_groups=8 and n_heads=8 of levels 1-2.
    return DATwConstantnC(nf=16, enc_res_blocks=1, dec_res_blocks=1,
                          mlp_ratio=2.0)


def _batch(B=2, H=32, W=48, with_flow=True, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "x0": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "x1": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "xt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "t": jnp.full((B, 1, 1, 1), 0.5, jnp.float32),
    }
    if with_flow:
        batch["f0x"] = jnp.asarray(
            (rng.standard_normal((B, H, W, 2)) * 0.02).astype(np.float32))
        batch["f1x"] = jnp.asarray(
            (rng.standard_normal((B, H, W, 2)) * 0.02).astype(np.float32))
    return batch


def test_dat_forward_shapes_and_range():
    model = _tiny_dat()
    b = _batch()
    params = model.init(jax.random.key(0), b["x0"], b["x1"], b["t"])
    pred = model.apply(params, b["x0"], b["x1"], b["t"])
    assert pred.shape == b["x0"].shape
    assert pred.dtype == jnp.float32
    out = np.asarray(pred)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_dat_train_outputs_and_loss_grads():
    model = _tiny_dat()
    b = _batch()
    params = model.init(jax.random.key(0), b["x0"], b["x1"], b["t"], train=True)

    def loss_fn(p):
        pred, inter = model.apply(p, b["x0"], b["x1"], b["t"], train=True)
        total, log = dat_loss(pred, inter, b, distill_lambda=0.01)
        return total, log

    (total, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(log) == {"l1_loss", "census_loss", "flow_loss", "total_loss"}
    # Every parameter should receive a finite gradient.
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # Zero-init offset convs must still receive gradient flow somewhere else:
    flat = {
        "/".join(str(k.key) for k in path): g
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]
    }
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in flat.values())
    assert nonzero > len(flat) * 0.8, f"too many dead grads: {nonzero}/{len(flat)}"


def test_dat_intermediate_flow_shapes():
    model = _tiny_dat()
    b = _batch(B=1, H=32, W=32)
    params = model.init(jax.random.key(1), b["x0"], b["x1"], b["t"], train=True)
    _, inter = model.apply(params, b["x0"], b["x1"], b["t"], train=True)
    for flows in (inter["pred_ft0"], inter["pred_ft1"]):
        assert len(flows) == 4
        for f in flows:
            assert f.shape == (1, 32, 32, 2)


def test_ifrnet_forward_and_loss():
    model = IFRNet(channels=(8, 12, 16, 24))
    b = _batch(B=1, H=32, W=32)
    params = model.init(jax.random.key(2), b["x0"], b["x1"], b["t"], train=True)

    pred = model.apply(params, b["x0"], b["x1"], b["t"])
    assert pred.shape == (1, 32, 32, 3)

    def loss_fn(p):
        pred, inter = model.apply(p, b["x0"], b["x1"], b["t"], train=True)
        mean = inter["mean"]
        gt_feats = model.apply(p, b["xt"] - mean, method=IFRNet.encode)
        total, log = ifrnet_loss(pred, inter, b, gt_feats)
        return total, log

    (total, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert "geometry_loss" in log
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_registry_reference_names():
    cfg = Config(model_name="DATwConstantnCv1", nf=16, enc_res_blocks=1,
                 dec_res_blocks=1, compute_dtype="float32")
    m = create_model(cfg)
    assert isinstance(m, DATwConstantnC)
    cfg2 = Config(model_name="IFRNet", compute_dtype="float32")
    assert isinstance(create_model(cfg2), IFRNet)
    with pytest.raises(ValueError):
        create_model(Config(model_name="nope"))
