"""Teacher-distillation training as a first-class Trainer mode.

The study driver (`tools/quality/head_to_head.py`) proved the recipe
(BENCH_NOTES.md round 4: +0.85 dB over the no-teacher control at the
20k-step horizon); these tests cover the productized path: Config keys
``teacher_ckpt`` / ``teacher_overrides`` / ``distill_teacher_w`` ->
``Trainer`` builds the frozen teacher, restores its params from either
checkpoint format, and trains the student with the extra output-space
Charbonnier term (``train/step.py:make_distill_train_step``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.train import create_train_state
from videoframeinterpolation_tpu.train.checkpoint import (
    CheckpointManager, restore_teacher_params,
)

RNG = np.random.default_rng(11)


def _student_cfg(**kw):
    return Config(
        model_name="DATwConstantnCv1", nf=16, enc_res_blocks=1,
        dec_res_blocks=1, compute_dtype="float32",
        dat_samples=(2, 2, 1), shared_offsets=True,
        crop_h=32, crop_w=32, batch_size=1,
        # no LR warmup: step 0 must move params for the `moved` check
        # (with the reference's 2000-step warmup, lr(0) == 0)
        warmup_steps=0, **kw,
    )


def _teacher_overrides():
    return {"dat_samples": [2, 2, 2]}


def _init_teacher(cfg):
    t_cfg = dataclasses.replace(cfg, **_teacher_overrides())
    teacher = create_model(t_cfg)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = teacher.init(jax.random.key(7), dummy, dummy, t, train=True)
    return t_cfg, teacher, params


def _batch(b=8, hw=(32, 32)):
    H, W = hw
    return {
        "x0": jnp.asarray(RNG.random((b, H, W, 3), np.float32)),
        "x1": jnp.asarray(RNG.random((b, H, W, 3), np.float32)),
        "xt": jnp.asarray(RNG.random((b, H, W, 3), np.float32)),
        "t": jnp.full((b, 1, 1, 1), 0.5, jnp.float32),
        "f0x": jnp.asarray(RNG.standard_normal((b, H, W, 2)).astype(np.float32)),
        "f1x": jnp.asarray(RNG.standard_normal((b, H, W, 2)).astype(np.float32)),
    }


def test_restore_teacher_params_both_formats(tmp_path):
    import flax.serialization as fser

    cfg = _student_cfg()
    t_cfg, teacher, params = _init_teacher(cfg)
    state = create_train_state(teacher, params, t_cfg)

    # format 1: head_to_head-style flax msgpack TrainState file
    f = tmp_path / "teacher.best.ckpt"
    f.write_bytes(fser.to_bytes(state))
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = restore_teacher_params(str(f), teacher, template, t_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # format 2: Orbax checkpoint dir written by CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "exp"))
    mgr.save("best_vimeo90k", state, epoch=1, best_psnr=30.0)
    restored = restore_teacher_params(
        str(tmp_path / "exp" / "checkpoints" / "best_vimeo90k"),
        teacher, template, t_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(FileNotFoundError):
        restore_teacher_params(str(tmp_path / "nope.ckpt"),
                               teacher, template, t_cfg)


def test_trainer_distill_step(tmp_path):
    """Trainer with teacher_ckpt: builds the teacher from overrides,
    restores params, and its train_step applies the teacher term."""
    import flax.serialization as fser

    from videoframeinterpolation_tpu.parallel import shard_batch
    from videoframeinterpolation_tpu.train.trainer import Trainer

    cfg = _student_cfg(
        exp_name="distill", log_dir=str(tmp_path / "exp"),
        data_name="Vimeo90KwFlow", root="unused",
    )
    t_cfg, teacher, t_params = _init_teacher(cfg)
    t_state = create_train_state(teacher, t_params, t_cfg)
    ckpt = tmp_path / "teacher.ckpt"
    ckpt.write_bytes(fser.to_bytes(t_state))

    cfg = dataclasses.replace(
        cfg, teacher_ckpt=str(ckpt),
        teacher_overrides=_teacher_overrides(), distill_teacher_w=0.25)
    trainer = Trainer(cfg)
    assert trainer.teacher is not None

    batch = shard_batch(_batch(b=8), trainer.mesh)
    # copy initial params out before the step (donate_argnums donates the
    # state into the compiled step)
    params0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), trainer.state.params)
    step0 = int(trainer.state.step)
    new_state, log = trainer.train_step(trainer.state, batch)
    assert "teacher_loss" in log and float(log["teacher_loss"]) > 0.0
    assert float(log["total_loss"]) > 0.0
    assert int(new_state.step) == step0 + 1
    # params actually moved
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params0),
                        jax.tree_util.tree_leaves(new_state.params)))
    assert moved

    # teacher term scales with distill_teacher_w: a second Trainer with
    # double weight (same seed -> identical student init, same batch)
    # reads exactly double the teacher_loss
    cfg2 = dataclasses.replace(cfg, distill_teacher_w=0.5)
    trainer2 = Trainer(cfg2)
    _, log2 = trainer2.train_step(trainer2.state, batch)
    np.testing.assert_allclose(
        float(log2["teacher_loss"]), 2.0 * float(log["teacher_loss"]),
        rtol=1e-5)


def test_trainer_without_teacher_unchanged(tmp_path):
    from videoframeinterpolation_tpu.train.trainer import Trainer

    cfg = _student_cfg(exp_name="plain", log_dir=str(tmp_path / "exp"))
    trainer = Trainer(cfg)
    assert trainer.teacher is None and trainer.teacher_params is None
