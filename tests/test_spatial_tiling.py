"""Spatially-tiled inference: blended tiles ~= full-frame inference."""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.parallel.spatial import tiled_inference


def test_tiled_matches_full_for_local_model():
    """With a purely local 'model' (elementwise blend), tiling must be exact
    up to blending arithmetic."""

    def infer(x0, x1, t):
        return 0.5 * (x0 + x1)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5)

    full = infer(x0, x1, t)
    tiled = tiled_inference(infer, x0, x1, t, tile_hw=(48, 48), overlap=16,
                            tile_batch=4)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_tiled_close_to_full_for_conv_model():
    """For a model with a small receptive field, interior pixels must match
    and seams stay small."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x0, x1, t):
            h = jnp.concatenate([x0, x1], -1)
            h = nn.Conv(8, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            return nn.Conv(3, (3, 3), padding="SAME")(h)

    model = Tiny()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5)
    params = model.init(jax.random.key(0), x0, x1, t)

    def infer(a, b, tt):
        return model.apply(params, a, b, tt)

    full = np.asarray(infer(x0, x1, t))
    tiled = np.asarray(
        tiled_inference(infer, x0, x1, t, tile_hw=(32, 32), overlap=16,
                        tile_batch=4)
    )
    # Receptive field is 2 pixels; a 16-px feathered overlap makes the
    # blend exact away from tile borders and tiny at them.
    np.testing.assert_allclose(tiled, full, rtol=1e-3, atol=2e-3)


def test_tile_covers_odd_sizes():
    def infer(x0, x1, t):
        return x0

    x0 = jnp.ones((1, 70, 90, 3))
    out = tiled_inference(infer, x0, x0, jnp.full((1, 1, 1, 1), 0.5),
                          tile_hw=(32, 32), overlap=8, tile_batch=3)
    assert out.shape == (1, 70, 90, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
