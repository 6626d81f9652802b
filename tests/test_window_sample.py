"""Windowed Pallas sampler vs the plain XLA sampler (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.kernels.window_sample import (
    windowed_deformable_sample,
)
from videoframeinterpolation_tpu.nn.deformable_attn import (
    _grouped_deformable_sample,
)


def _case(B2=2, H=8, W=12, G=4, S=8, C=16, sc=2.0, flow_mag=3.0, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.standard_normal((B2, H, W, C)).astype(np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((B2, H, W, 2)) * flow_mag).astype(np.float32))
    residual = jnp.asarray(
        (rng.uniform(-sc, sc, (B2, H, W, G, S, 2)) * 0.999).astype(np.float32))
    return feat, flow, residual


def test_windowed_matches_xla_sampler_interior():
    feat, flow, residual = _case()
    ref = _grouped_deformable_sample(
        feat, residual + flow[:, :, :, None, None, :], 4)
    out = windowed_deformable_sample(feat, flow, residual, 4, 2.0,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_windowed_matches_with_large_flows():
    """Flows pushing windows far out of frame (clamped starts + masks)."""
    feat, flow, residual = _case(flow_mag=20.0, seed=1)
    ref = _grouped_deformable_sample(
        feat, residual + flow[:, :, :, None, None, :], 4)
    out = windowed_deformable_sample(feat, flow, residual, 4, 2.0,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_windowed_lv_configs():
    """The flagship's lv2-like config (G=8, S=16, scale 4)."""
    feat, flow, residual = _case(B2=2, H=8, W=8, G=8, S=16, C=24, sc=4.0,
                                 seed=2)
    ref = _grouped_deformable_sample(
        feat, residual + flow[:, :, :, None, None, :], 8)
    out = windowed_deformable_sample(feat, flow, residual, 8, 4.0,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
