"""Teacher-distillation train step (train/step.py:make_distill_*).

The round-4 quality-recovery arm trains the fast flagship with an
output-space distillation term from the exact-parity teacher
(``tools/quality/head_to_head.py --distill_from``). These tests pin the
step function it uses:

- the distilled loss is exactly ``base_loss + w * Charbonnier(pred -
  teacher_pred)`` (no silent recipe drift vs the non-distilled arms);
- the teacher is frozen — zero gradient flows into its params;
- the pool-chunked distill step runs on the 8-device mesh and matches a
  hand-rolled sequential loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.ops.losses import charbonnier_l1
from videoframeinterpolation_tpu.parallel import create_mesh
from videoframeinterpolation_tpu.train import (
    create_train_state,
    make_distill_loss_fn,
    make_distill_pool_chunked_step,
    make_loss_fn,
)

from test_train_step import _batch, _tiny_cfg

W_T = 0.5


def _setup(seed_t=7):
    cfg = _tiny_cfg(shared_offsets=True, dat_samples=(4, 4, 2))
    model = create_model(cfg)
    t_cfg = _tiny_cfg()  # exact-parity teacher architecture
    teacher = create_model(t_cfg)
    b = _batch(8)
    init = {k: jnp.asarray(v[:1]) for k, v in b.items()}
    params = model.init(jax.random.key(0), init["x0"], init["x1"],
                        init["t"], train=True)
    t_params = teacher.init(jax.random.key(seed_t), init["x0"], init["x1"],
                            init["t"], train=True)
    return cfg, model, teacher, params, t_params, b


def test_distill_loss_decomposition():
    cfg, model, teacher, params, t_params, b = _setup()
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    base_loss, _ = make_loss_fn(model, cfg)(params, batch)
    total, log = make_distill_loss_fn(model, teacher, cfg, W_T)(
        params, t_params, batch)

    pred, _ = model.apply(params, batch["x0"], batch["x1"], batch["t"],
                          train=True)
    t_pred = teacher.apply(t_params, batch["x0"], batch["x1"], batch["t"])
    expect_t = W_T * charbonnier_l1(pred - t_pred)

    np.testing.assert_allclose(float(log["teacher_loss"]), float(expect_t),
                               rtol=1e-6)
    np.testing.assert_allclose(float(total), float(base_loss + expect_t),
                               rtol=1e-6)


def test_teacher_gets_no_gradient():
    cfg, model, teacher, params, t_params, b = _setup()
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    loss_fn = make_distill_loss_fn(model, teacher, cfg, W_T)

    t_grads = jax.grad(lambda tp: loss_fn(params, tp, batch)[0])(t_params)
    for leaf in jax.tree_util.tree_leaves(t_grads):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0


def test_distill_chunked_matches_sequential():
    cfg, model, teacher, params, t_params, b = _setup()
    mesh = create_mesh(8)
    K = 2
    loss_fn = make_distill_loss_fn(model, teacher, cfg, W_T)

    pool = {k: np.concatenate([v, v[::-1]]) for k, v in b.items()}
    idx = np.arange(K * 8, dtype=np.int32).reshape(K, 8)

    # Sequential reference: plain value_and_grad + apply_gradients.
    state = create_train_state(
        model, jax.tree_util.tree_map(lambda x: x.copy(), params), cfg)
    seq_losses = []
    for i in range(K):
        batch = {k: jnp.asarray(v[idx[i]]) for k, v in pool.items()}
        (_, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, t_params, batch)
        state = state.apply_gradients(grads=grads)
        seq_losses.append(float(log["total_loss"]))

    state_c = create_train_state(model, params, cfg)
    step = make_distill_pool_chunked_step(model, teacher, cfg, mesh, K, W_T)
    state_c, logs = step(state_c, t_params, jax.device_put(pool), idx)

    assert int(state_c.step) == K
    np.testing.assert_allclose(np.asarray(logs["total_loss"]),
                               np.asarray(seq_losses), rtol=1e-5, atol=1e-7)
    for a, c in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-7)
