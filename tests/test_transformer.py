"""Tests for the GMFlow transformer stack and Swin utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.nn.transformer import (
    FeatureTransformer,
    SelfAttnPropagation,
    feature_add_position,
    global_correlation_softmax,
    merge_windows,
    shifted_window_attn_mask,
    split_windows,
)
from videoframeinterpolation_tpu.nn.swin import (
    SwinIRBlock,
    window_partition,
    window_reverse,
)
from videoframeinterpolation_tpu.nn.position import position_embedding_sine


def test_split_merge_windows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    for k in (1, 2, 4):
        if 8 % k or 12 % k:
            continue
        y = merge_windows(split_windows(x, k), k)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_window_partition_reverse_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w = window_partition(x, (4, 4))
    assert w.shape == (2 * 4, 4, 4, 4)
    back = window_reverse(w, (4, 4), 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shifted_window_mask_structure():
    m = shifted_window_attn_mask(8, 8, 2)  # windows 4x4, shift 2
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # First (non-boundary) window is fully visible.
    np.testing.assert_array_equal(m[0], np.zeros((16, 16)))


def test_global_correlation_recovers_integer_shift():
    """A feature map matched against a spatially shifted copy must produce
    (approximately) the shift as flow."""
    rng = np.random.default_rng(2)
    H = W = 12
    base = rng.standard_normal((1, H + 2, W + 2, 32)).astype(np.float32) * 20
    f0 = jnp.asarray(base[:, 1:H + 1, 1:W + 1])
    # feature1 shifted left by 1: content at x in f1 == content at x+1 in f0
    f1 = jnp.asarray(base[:, 1:H + 1, 2:W + 2])
    f01, f10, dual = global_correlation_softmax(f0, f1)
    interior = np.asarray(f01)[0, 3:-3, 3:-3]
    # The overwhelming majority of interior pixels must recover the shift
    # (random features can produce rare accidental global matches).
    good = (np.abs(interior[..., 0] + 1.0) < 0.15) & (
        np.abs(interior[..., 1]) < 0.15)
    assert good.mean() > 0.9, good.mean()
    assert dual.shape == (1, H * W, H * W)


def test_feature_transformer_shapes_and_bidirectionality():
    rng = np.random.default_rng(3)
    f0 = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    tr = FeatureTransformer(num_layers=2, d_model=16)
    params = tr.init(jax.random.key(0), f0, f1, num_splits=2)
    o0, o1 = tr.apply(params, f0, f1, num_splits=2)
    assert o0.shape == f0.shape and o1.shape == f1.shape
    # Symmetry: swapping inputs swaps outputs.
    s1, s0 = tr.apply(params, f1, f0, num_splits=2)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(o0),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_position_embedding_shape_and_range():
    pe = position_embedding_sine(6, 9, num_pos_feats=8)
    assert pe.shape == (1, 6, 9, 16)
    v = np.asarray(pe)
    assert v.min() >= -1.0 - 1e-6 and v.max() <= 1.0 + 1e-6


def test_self_attn_propagation_shapes():
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    val = jnp.asarray(rng.standard_normal((2, 6, 6, 2)).astype(np.float32))
    m = SelfAttnPropagation(8)
    p = m.init(jax.random.key(0), feat, val)
    out = m.apply(p, feat, val)
    assert out.shape == (2, 6, 6, 2)


def test_swin_block_odd_sizes_padding():
    """SwinIRBlock must handle non-multiple-of-window sizes via padding."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 7, 9, 8)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((1, 7, 9, 8)).astype(np.float32))
    blk = SwinIRBlock(8, num_heads=2, window_size=4, shift_size=2)
    p = blk.init(jax.random.key(0), x, f)
    out = blk.apply(p, x, f)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
