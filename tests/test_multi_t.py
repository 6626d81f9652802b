"""Staged encode/decode API + multi-instant inference (models/base.py).

The flagship's encoder pyramid is t-invariant; ``multi_t_apply`` runs it
once per pair and decodes every interpolation instant inside one traced
program (``interpolate.py --mode direct``). No reference counterpart —
the reference's eval scripts are t=0.5-only."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoframeinterpolation_tpu.models import DATwConstantnC, multi_t_apply

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def tiny():
    model = DATwConstantnC(nf=24, enc_res_blocks=1, dec_res_blocks=1,
                           mlp_ratio=2.0)
    x0 = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    x1 = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0, x1, t)
    return model, params, x0, x1, t


def test_staged_equals_call(tiny):
    """encode -> decode through apply(method=...) is exactly __call__."""
    model, params, x0, x1, t = tiny
    y = model.apply(params, x0, x1, t)
    feats, mean = model.apply(params, x0, x1, method="encode")
    y2 = model.apply(params, feats, mean, t, method="decode")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_multi_t_matches_per_t(tiny):
    model, params, x0, x1, t = tiny
    ts = (0.25, 0.5, 0.75)
    preds = multi_t_apply(model, params, x0, x1, ts)
    assert preds.shape == (3, 1, 32, 32, 3)
    for k, tv in enumerate(ts):
        y = model.apply(params, x0, x1,
                        jnp.full((1, 1, 1, 1), tv, jnp.float32))
        np.testing.assert_array_equal(np.asarray(preds[k]), np.asarray(y))


def test_encoder_shared_in_compiled_program(tiny):
    """The 3-instant program must contain the encoder ONCE: its conv count
    grows by strictly less than 3x the single-instant program's."""
    model, params, x0, x1, _ = tiny

    def count_convs(ts):
        f = jax.jit(lambda p, a, b: multi_t_apply(model, p, a, b, ts))
        txt = f.lower(params, x0, x1).compile().as_text()
        return len(re.findall(r" convolution\(", txt))

    c1 = count_convs((0.5,))
    c3 = count_convs((0.25, 0.5, 0.75))
    # decode triples; the encoder's convs must not. (Tiny config: the
    # encoder is 10 convs, so full sharing means c3 == 3*c1 - 20.)
    assert c3 <= 3 * c1 - 10, (c1, c3)


def test_train_path_unchanged(tiny):
    """__call__(train=True) still returns (pred, intermediates)."""
    model, params, x0, x1, t = tiny
    pred, inter = model.apply(params, x0, x1, t, train=True)
    assert pred.shape == (1, 32, 32, 3)
    assert set(inter) == {"pred_ft0", "pred_ft1"}
