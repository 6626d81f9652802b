"""Per-level flagship sample counts (``Config.dat_samples``).

The reference hardcodes (8, 16, 32) samples at DAT levels (lv3, lv2, lv1)
(``/root/reference/models/DAT.py:24-26``); the rebuild makes the triple
configurable because the lv1 sampler's gather rows — the measured hot spot
(tools/perf/README.md) — scale linearly with the lv1 count. These tests pin
the wiring: offset-conv widths, default parity, and a trainable forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model, dat_loss


def _model(samples=None, shared=False):
    kw = {} if samples is None else {"dat_samples": samples}
    cfg = Config(model_name="DATwConstantnCv1", nf=16,
                 enc_res_blocks=1, dec_res_blocks=1,
                 shared_offsets=shared, **kw)
    return create_model(cfg)


def _init(m):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    p = m.init(jax.random.key(3), x0, x1, t, train=True)
    return p, x0, x1, t


def test_default_matches_reference_counts():
    m = _model()
    assert m.n_samples == (8, 16, 32)
    p, *_ = _init(m)
    # offset conv out-channels = n_groups * S * 2 per level
    for lv, g, s in (("dat_lv3", 4, 8), ("dat_lv2", 8, 16), ("dat_lv1", 8, 32)):
        k = p["params"][lv]["conv_res_offset"]["kernel"]
        assert k.shape[-1] == g * s * 2, (lv, k.shape)


def test_reduced_lv1_samples_shrink_offset_conv_only():
    m16 = _model(samples=(8, 16, 16), shared=True)
    m32 = _model(shared=True)
    p16, x0, x1, t = _init(m16)
    p32, *_ = _init(m32)
    k16 = p16["params"]["dat_lv1"]["conv_res_offset"]["kernel"]
    k32 = p32["params"]["dat_lv1"]["conv_res_offset"]["kernel"]
    assert k16.shape[-1] * 2 == k32.shape[-1]
    # attention K/V projections act per-sample on feature channels — widths
    # are unchanged; only the sample axis of the kv tensor shrinks.
    a16 = p16["params"]["dat_lv1"]["attn"]["k_proj"]["kernel"]
    a32 = p32["params"]["dat_lv1"]["attn"]["k_proj"]["kernel"]
    assert a16.shape == a32.shape
    # lv3/lv2 parameter shapes are untouched.
    f16 = dict(jax.tree_util.tree_flatten_with_path(p16)[0])
    f32 = dict(jax.tree_util.tree_flatten_with_path(p32)[0])
    for k, v in f32.items():
        if "dat_lv1" in str(k) and "conv_res_offset" in str(k):
            continue
        assert f16[k].shape == v.shape, k


def test_reduced_samples_forward_and_gradients():
    m = _model(samples=(8, 16, 16), shared=True)
    p, x0, x1, t = _init(m)
    pred = m.apply(p, x0, x1, t)
    assert pred.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(pred)))

    batch = {
        "xt": (x0 + x1) / 2,
        "f0x": jnp.zeros(x0.shape[:3] + (2,)),
        "f1x": jnp.zeros(x0.shape[:3] + (2,)),
    }

    def loss_fn(params):
        out, inter = m.apply(params, x0, x1, t, train=True)
        total, _ = dat_loss(out, inter, batch)
        return total

    loss, g = jax.value_and_grad(loss_fn)(p)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))
