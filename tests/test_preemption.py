"""Graceful preemption (SURVEY.md section 5.3): SIGTERM mid-training ->
finish the in-flight step, save ``latest``, exit cleanly, resume losing
nothing. The reference has no preemption handling at all
(``train.py:20-132`` installs no signal handlers)."""

import os
import signal

import jax
import numpy as np

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.train.preemption import PreemptionGuard

from test_trainer_e2e import _make_vimeo_tree


def test_guard_catches_sigterm_and_chains():
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        guard = PreemptionGuard()
        with guard:
            assert not guard.preempted
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.preempted
            assert seen == [signal.SIGTERM]  # previous handler chained
        # uninstalled: the original handler is back in charge
        os.kill(os.getpid(), signal.SIGTERM)
        assert seen == [signal.SIGTERM, signal.SIGTERM]
        assert guard.preempted  # flag is sticky
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_never_chains_sig_dfl():
    prev = signal.signal(signal.SIGTERM, signal.SIG_DFL)
    try:
        with PreemptionGuard() as guard:
            # chaining SIG_DFL would terminate the test process here
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.preempted
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_trainer_preemption_saves_and_resumes(tmp_path):
    from videoframeinterpolation_tpu.parallel import create_mesh
    from videoframeinterpolation_tpu.train.step import make_train_step
    from videoframeinterpolation_tpu.train.trainer import Trainer

    root = _make_vimeo_tree(tmp_path)
    cfg = Config(
        exp_name="preempt", log_dir=str(tmp_path / "exp"),
        model_name="DATwConstantnCv1", nf=16, enc_res_blocks=1,
        dec_res_blocks=1, compute_dtype="float32",
        data_name="Vimeo90KwFlow", root=root, flow_dir="flow",
        crop_h=32, crop_w=32, num_epochs=2, batch_size=2, num_workers=2,
        valid_freq_epoch=10**9, val_datasets=(),
        save_latest_freq=10**9, save_every_freq_epoch=10**9,
        img_summary_freq=10**9, metric_summary_freq=1,
    )
    trainer = Trainer(cfg)
    trainer.mesh = create_mesh(2)
    trainer.n_devices = 2
    trainer.train_step = make_train_step(trainer.model, cfg, trainer.mesh)

    # Preemption arrives before the loop starts: exactly one step runs
    # (the guard is polled after each step), then 'latest' is saved even
    # though save_latest_freq would never fire.
    guard = PreemptionGuard()
    guard.trip()
    trainer.train(preemption_guard=guard)
    assert int(trainer.state.step) == 1
    assert trainer.ckpt.exists("latest")

    # Resume restores the preempted step exactly and finishes the run.
    trainer2 = Trainer(cfg)
    trainer2.mesh = trainer.mesh
    trainer2.n_devices = 2
    trainer2.train_step = make_train_step(trainer2.model, cfg, trainer2.mesh)
    assert trainer2.resume("latest")
    assert int(trainer2.state.step) == 1
    for x, y in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    trainer2.train()  # no guard tripped: runs to completion
    assert int(trainer2.state.step) > 1
