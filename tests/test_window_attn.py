"""Exactness tests for the windowed deformable-sampling fast path.

``windowed_deformable_sample`` / ``CrossDeformableAttentionBlock(
window_sampling=True)`` must compute the *same function* (same outputs,
same gradients, same parameter tree) as the per-tap-gather path it
accelerates — it is a speed switch, not a different model. Reference
semantics: ``modules/deformable_attn.py:88-101``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.nn.deformable_attn import (
    CrossDeformableAttentionBlock,
    _grouped_deformable_sample,
)
from videoframeinterpolation_tpu.ops.windowed import windowed_deformable_sample


def _sample_inputs(B=2, H=10, W=14, C=8, G=2, S=3, oscale=2.0,
                   flow_mag=6.0, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    # Flows large enough to push many windows (partially) out of bounds.
    flow = jnp.asarray(rng.uniform(-flow_mag, flow_mag, (B, H, W, 2)),
                       jnp.float32)
    res = jnp.asarray(
        rng.uniform(-oscale, oscale, (B, H, W, G, S, 2)), jnp.float32)
    return feat, flow, res


def test_windowed_sample_matches_gather_sample():
    feat, flow, res = _sample_inputs()
    ref = _grouped_deformable_sample(
        feat, res + flow[:, :, :, None, None, :], 2)
    for impl in ("slice", "packed"):
        win = windowed_deformable_sample(feat, flow, res, 2, 2.0, impl=impl)
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                                   rtol=0, atol=1e-5, err_msg=impl)


def test_windowed_sample_matches_at_large_offset_scale():
    # lv1 geometry: offset_scale 8 -> 19x19 windows larger than the map.
    feat, flow, res = _sample_inputs(H=8, W=10, G=4, S=5, oscale=8.0,
                                     flow_mag=12.0, seed=3)
    ref = _grouped_deformable_sample(
        feat, res + flow[:, :, :, None, None, :], 4)
    win = windowed_deformable_sample(feat, flow, res, 4, 8.0)
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_windowed_sample_gradients_match():
    feat, flow, res = _sample_inputs(B=1, H=8, W=10, seed=7)
    cot = jnp.asarray(
        np.random.default_rng(8).standard_normal((1, 3, 80, 8)), jnp.float32)

    def loss_ref(feat, flow, res):
        kv = _grouped_deformable_sample(
            feat, res + flow[:, :, :, None, None, :], 2)
        return jnp.sum(kv * cot)

    def loss_win(feat, flow, res):
        return jnp.sum(windowed_deformable_sample(feat, flow, res, 2, 2.0)
                       * cot)

    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(feat, flow, res)
    g_w = jax.grad(loss_win, argnums=(0, 1, 2))(feat, flow, res)
    for a, b in zip(g_r, g_w):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_windowed_sample_chunking_invariant():
    feat, flow, res = _sample_inputs(B=1, H=8, W=12, seed=11)
    outs = []
    # 96 queries: single chunk, dividing chunks, and a ragged chunk size
    # that exercises the padding path.
    for cq in (4096, 24, 20):
        outs.append(np.asarray(
            windowed_deformable_sample(feat, flow, res, 2, 2.0, q_chunk=cq)))
    np.testing.assert_allclose(outs[1], outs[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(outs[2], outs[0], rtol=0, atol=1e-6)


def test_windowed_block_matches_gather_block():
    kw = dict(features=8, out_features=8, n_samples=3, n_groups=2,
              n_heads=2, offset_scale=2.0)
    ref = CrossDeformableAttentionBlock(**kw)
    win = CrossDeformableAttentionBlock(window_sampling=True, **kw)

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 12, 16, 8
    inputs = (
        jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32),
        jnp.asarray(rng.uniform(-6, 6, (B, H, W, 2)), jnp.float32),
        jnp.asarray(rng.uniform(-6, 6, (B, H, W, 2)), jnp.float32),
    )
    params = ref.init(jax.random.key(0), *inputs)
    # Identical parameter trees: the flag swaps implementation, not params.
    out_r, up0_r, up1_r = ref.apply(params, *inputs)
    out_w, up0_w, up1_w = win.apply(params, *inputs)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_r),
                               rtol=0, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(up0_w), np.asarray(up0_r))
    np.testing.assert_array_equal(np.asarray(up1_w), np.asarray(up1_r))


def test_flagship_model_window_sampling_parity():
    from videoframeinterpolation_tpu.models import DATwConstantnC

    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)), jnp.float32)
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)

    m_ref = DATwConstantnC(nf=16, enc_res_blocks=1, dec_res_blocks=1)
    m_win = DATwConstantnC(nf=16, enc_res_blocks=1, dec_res_blocks=1,
                           window_sampling=True)
    params = m_ref.init(jax.random.key(4), x0, x1, t)
    out_r = m_ref.apply(params, x0, x1, t)
    out_w = m_win.apply(params, x0, x1, t)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_r),
                               rtol=0, atol=1e-4)
