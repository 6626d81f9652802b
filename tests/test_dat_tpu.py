"""TPU-native flagship variant: shapes, grads, window extraction."""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.nn.local_attn import extract_local_windows
from videoframeinterpolation_tpu.models.dat_tpu import (
    DATwConstantnCTPU,
    dat_tpu_loss,
)


def test_extract_local_windows_semantics():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, 6, 3)).astype(np.float32))
    win = extract_local_windows(x, 1)
    assert win.shape == (1, 9, 30, 3)
    w = np.asarray(win).reshape(1, 9, 5, 6, 3)
    # center view (dy=1, dx=1 -> index 4) is the identity
    np.testing.assert_array_equal(w[0, 4], np.asarray(x)[0])
    # top-left view at interior pixel (2,2) is x[1,1]
    np.testing.assert_array_equal(w[0, 0, 2, 2], np.asarray(x)[0, 1, 1])
    # zero padding at the border of the shifted view
    np.testing.assert_array_equal(w[0, 0, 0, 0], 0.0)


def test_dat_tpu_forward_and_grads():
    model = DATwConstantnCTPU(nf=16, enc_res_blocks=1, dec_res_blocks=1,
                              radii=(1, 1, 2))
    rng = np.random.default_rng(1)
    b = {
        "x0": jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)),
        "x1": jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)),
        "xt": jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)),
        "t": jnp.full((1, 1, 1, 1), 0.5, jnp.float32),
        "f0x": jnp.zeros((1, 32, 32, 2)),
        "f1x": jnp.zeros((1, 32, 32, 2)),
    }
    params = model.init(jax.random.key(0), b["x0"], b["x1"], b["t"],
                        train=True)

    pred = model.apply(params, b["x0"], b["x1"], b["t"])
    assert pred.shape == (1, 32, 32, 3)
    assert 0.0 <= float(pred.min()) and float(pred.max()) <= 1.0

    def loss_fn(p):
        pred, inter = model.apply(p, b["x0"], b["x1"], b["t"], train=True)
        total, _ = dat_tpu_loss(pred, inter, b)
        return total

    total, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_shift_window_attention_matches_materialized_windows():
    """ShiftWindowSampleAttention must reproduce SampleAttention over
    extract_local_windows exactly (same params; projections are pointwise,
    out-of-window inputs project to the bias)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoframeinterpolation_tpu.nn.deformable_attn import SampleAttention
    from videoframeinterpolation_tpu.nn.local_attn import (
        ShiftWindowSampleAttention,
        extract_local_windows,
    )

    B, H, W, C = 2, 12, 10, 16
    radius, nh = 2, 4
    K2 = (2 * radius + 1) ** 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w0 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    new = ShiftWindowSampleAttention(C, radius, nh)
    params = new.init(jax.random.key(1), q, w0, w1)

    old = SampleAttention(C, 2 * K2, nh)
    kv = jnp.concatenate([
        extract_local_windows(w0, radius),
        extract_local_windows(w1, radius),
    ], axis=1)
    ref = old.apply(params, q, kv)
    got = new.apply(params, q, w0, w1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_group_offsets_zero_init_matches_plain_block():
    """n_offset_groups adds a zero-init offset conv: at init the per-group
    flows equal the base flow, so outputs match the plain block exactly —
    a trained plain checkpoint upgrades in place."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoframeinterpolation_tpu.nn.local_attn import (
        LocalWindowCrossAttentionBlock,
    )

    B, H, W, C = 1, 12, 16, 16
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
            for _ in range(3)]
    flows = [jnp.asarray(
        (rng.standard_normal((B, H, W, 2)) * 2).astype(np.float32))
        for _ in range(2)]

    plain = LocalWindowCrossAttentionBlock(C, C, radius=2, n_heads=4,
                                           pred_res_flow=False)
    goff = LocalWindowCrossAttentionBlock(C, C, radius=2, n_heads=4,
                                          pred_res_flow=False,
                                          n_offset_groups=4,
                                          offset_scale=8.0)
    p_goff = goff.init(jax.random.key(0), *args, *flows)
    # Shared-submodule params transfer verbatim; the extra conv is zero.
    p_plain = {"params": {k: v for k, v in p_goff["params"].items()
                          if k != "conv_group_offset"}}
    out_plain = plain.apply(p_plain, *args, *flows)
    out_goff = goff.apply(p_goff, *args, *flows)
    np.testing.assert_allclose(np.asarray(out_goff), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-6)

    # And with a nonzero offset conv the outputs must actually change.
    p2 = jax.tree_util.tree_map(lambda x: x, p_goff)
    p2["params"]["conv_group_offset"]["kernel"] = (
        p_goff["params"]["conv_group_offset"]["kernel"] + 0.5)
    out2 = goff.apply(p2, *args, *flows)
    assert not np.allclose(np.asarray(out2), np.asarray(out_plain),
                           atol=1e-4)
