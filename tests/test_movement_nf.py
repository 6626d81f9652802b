"""Per-level movement-extractor width (``Config.dat_movement_nf``).

The reference's movement extractor is always ``nf`` wide
(``/root/reference/modules/deformable_attn.py:54-60``); the rebuild makes
the width configurable per DAT level because after the sample-count
ladder the lv1 movement convs are the largest remaining per-query cost
(tools/perf/README.md round-3 lever (a)). These tests pin the wiring:
movement-conv widths, default parity, and a trainable forward+backward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model, dat_loss


def _model(movement_nf=None):
    kw = {} if movement_nf is None else {"dat_movement_nf": movement_nf}
    cfg = Config(model_name="DATwConstantnCv1", nf=16,
                 enc_res_blocks=1, dec_res_blocks=1,
                 shared_offsets=True, dat_samples=(8, 8, 2), **kw)
    return create_model(cfg)


def _init(m):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    p = m.init(jax.random.key(3), x0, x1, t, train=True)
    return p, x0, x1, t


def test_default_is_reference_parity_width():
    m = _model()
    p, *_ = _init(m)
    for lv in ("dat_lv3", "dat_lv2", "dat_lv1"):
        k = p["params"][lv]["movement_conv2"]["conv"]["kernel"]
        assert k.shape[-1] == 16, (lv, k.shape)


def test_thin_movement_changes_only_movement_widths():
    m = _model(movement_nf=(16, 16, 8))
    p, x0, x1, t = _init(m)
    k1 = p["params"]["dat_lv1"]["movement_conv1"]["conv"]["kernel"]
    k2 = p["params"]["dat_lv1"]["movement_conv2"]["conv"]["kernel"]
    assert k1.shape[-1] == 16  # mc * 2
    assert k2.shape[-1] == 8
    # untouched level keeps parity width
    assert (p["params"]["dat_lv2"]["movement_conv2"]["conv"]["kernel"]
            .shape[-1] == 16)
    # attention / offset heads adapt: forward + loss + grads still work
    def loss_fn(p):
        img_pred, inter = m.apply(p, x0, x1, t, train=True)
        gt = {"xt": x0, "f0x": jnp.zeros((1, 32, 48, 2)),
              "f1x": jnp.zeros((1, 32, 48, 2)), "t": t}
        total, _ = dat_loss(img_pred, inter, gt, distill_lambda=0.01)
        return total

    val, grads = jax.value_and_grad(loss_fn)(p)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
