"""Shared-offset flagship variant (``shared_offsets=True``).

The variant learns ONE deformable offset set per DAT level shared by all
channel groups (``nn/deformable_attn.py``), cutting sampler gather rows by
``n_groups``. These tests pin the wiring: a full-group model whose
``conv_res_offset`` parameters are a G-fold tiling of the shared model's
must compute the *identical* function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model, dat_loss


def _models():
    shared_cfg = Config(model_name="DATwConstantnCv1", nf=16,
                        enc_res_blocks=1, dec_res_blocks=1,
                        shared_offsets=True)
    full_cfg = Config(model_name="DATwConstantnCv1", nf=16,
                      enc_res_blocks=1, dec_res_blocks=1)
    return create_model(shared_cfg), create_model(full_cfg)


def _tile_offset_convs(shared_params, full_params):
    """Full-model params equal to the shared model's, with every DAT
    level's ``conv_res_offset`` tiled G times along output channels
    (layout is (G, S, 2)-major, ``nn/deformable_attn.py:_res_offsets``)."""
    out = jax.tree_util.tree_map(lambda x: x, shared_params)  # copy

    def fix(level):
        blk_s = out["params"][level]["conv_res_offset"]
        blk_f = full_params["params"][level]["conv_res_offset"]
        g = blk_f["kernel"].shape[-1] // blk_s["kernel"].shape[-1]
        blk_s["kernel"] = jnp.concatenate([blk_s["kernel"]] * g, axis=-1)
        blk_s["bias"] = jnp.concatenate([blk_s["bias"]] * g, axis=-1)

    for level in ("dat_lv3", "dat_lv2", "dat_lv1"):
        fix(level)
    return out


@pytest.fixture(scope="module")
def setup():
    shared_m, full_m = _models()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    sp = shared_m.init(jax.random.key(3), x0, x1, t, train=True)
    return shared_m, full_m, sp, x0, x1, t


def test_param_tree_differs_only_in_offset_convs(setup):
    shared_m, full_m, sp, x0, x1, t = setup
    fp = full_m.init(jax.random.key(3), x0, x1, t, train=True)
    sflat = dict(jax.tree_util.tree_flatten_with_path(sp)[0])
    fflat = dict(jax.tree_util.tree_flatten_with_path(fp)[0])
    assert set(map(str, sflat)) == set(map(str, fflat))
    for k, v in fflat.items():
        s = sflat[k]
        if "conv_res_offset" in str(k):
            assert v.shape[-1] == s.shape[-1] * (
                4 if "lv3" in str(k) else 8)
        else:
            assert v.shape == s.shape


def test_tiled_full_model_matches_shared(setup):
    shared_m, full_m, sp, x0, x1, t = setup
    fp = full_m.init(jax.random.key(3), x0, x1, t, train=True)
    fp_tiled = _tile_offset_convs(sp, fp)

    pred_s = shared_m.apply(sp, x0, x1, t)
    pred_f = full_m.apply(fp_tiled, x0, x1, t)
    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(pred_f),
                               atol=1e-5)


def test_shared_offsets_train_gradients(setup):
    shared_m, _, sp, x0, x1, t = setup
    batch = {
        "xt": (x0 + x1) / 2,
        "f0x": jnp.zeros(x0.shape[:3] + (2,)),
        "f1x": jnp.zeros(x0.shape[:3] + (2,)),
    }

    def loss_fn(p):
        pred, inter = shared_m.apply(p, x0, x1, t, train=True)
        total, _ = dat_loss(pred, inter, batch)
        return total

    loss, g = jax.value_and_grad(loss_fn)(sp)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # The shared offset conv must receive gradient (its zero-init output
    # still has nonzero input-gradient through tanh'(0) and the sampler's
    # position derivative).
    gn = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree_util.tree_leaves(
                 g["params"]["dat_lv1"]["conv_res_offset"]))
    assert gn > 0
