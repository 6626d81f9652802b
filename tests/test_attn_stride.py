"""Strided lv1 deformable attention (``Config.dat_attn_stride``).

The strided variant runs the finest DAT block on a 2x-subsampled query
grid (sampling full-res source features) and returns through a learned
upsample + zero-init detail conv. TPU-fast architecture variant — trains
from scratch; quality study in BENCH_NOTES.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.models.dat import dat_loss


def _tiny_cfg(**kw):
    return Config(
        model_name="DATwConstantnCv1", nf=16, enc_res_blocks=1,
        dec_res_blocks=1, shared_offsets=True, dat_samples=[4, 4, 4],
        **kw,
    )


def _data(b=1, h=32, w=48):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    t = jnp.full((b, 1, 1, 1), 0.5, jnp.float32)
    return x0, x1, t


def _param_names(params):
    leaves = jax.tree_util.tree_leaves_with_path(params)
    return {jax.tree_util.keystr(path) for path, _ in leaves}


def test_strided_forward_shape_and_new_params():
    cfg = _tiny_cfg(dat_attn_stride=[1, 1, 2])
    m = create_model(cfg)
    x0, x1, t = _data()
    params = m.init(jax.random.key(0), x0, x1, t)
    out = m.apply(params, x0, x1, t)
    assert out.shape == x0.shape
    names = _param_names(params)
    assert any("conv_detail" in n for n in names)
    assert any("attn_upsample" in n for n in names)

    # stride=1 keeps the reference parameter tree (no upsample/detail).
    m1 = create_model(_tiny_cfg())
    names1 = _param_names(m1.init(jax.random.key(0), x0, x1, t))
    assert not any("conv_detail" in n for n in names1)
    assert not any("attn_upsample" in n for n in names1)


def test_strided_grad_flows_through_offsets():
    cfg = _tiny_cfg(dat_attn_stride=[1, 1, 2])
    m = create_model(cfg)
    x0, x1, t = _data()
    params = m.init(jax.random.key(0), x0, x1, t, train=True)
    batch = {
        "xt": x1,
        "f0x": jnp.zeros(x0.shape[:3] + (2,)),
        "f1x": jnp.zeros(x0.shape[:3] + (2,)),
    }

    def loss_fn(p):
        pred, inter = m.apply(p, x0, x1, t, train=True)
        return dat_loss(pred, inter, batch)[0]

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    # The strided lv1 offset conv must receive gradient (the sampler's
    # coordinate VJP feeds it); so must the learned upsample.
    for key in ("dat_lv1", "attn_upsample"):
        total = sum(
            float(jnp.sum(jnp.abs(leaf)))
            for path, leaf in flat
            if key in jax.tree_util.keystr(path)
        )
        assert total > 0.0, key
    off = sum(
        float(jnp.sum(jnp.abs(leaf)))
        for path, leaf in flat
        if "dat_lv1" in jax.tree_util.keystr(path)
        and "conv_res_offset" in jax.tree_util.keystr(path)
    )
    assert off > 0.0


def test_stride_only_allowed_at_lv1():
    with pytest.raises(ValueError):
        m = create_model(_tiny_cfg(dat_attn_stride=[1, 2, 1]))
        x0, x1, t = _data()
        m.init(jax.random.key(0), x0, x1, t)


def test_stride_yaml_roundtrip(tmp_path):
    cfg = _tiny_cfg(dat_attn_stride=[1, 1, 2])
    p = tmp_path / "c.yaml"
    cfg.save_yaml(str(p))
    cfg2 = Config.from_yaml(str(p))
    assert tuple(cfg2.dat_attn_stride) == (1, 1, 2)
