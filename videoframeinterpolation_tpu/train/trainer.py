"""Training orchestration (reference ``train.py:20-132`` + ``Trainer.py``).

Differences from the reference, by design:
  * one jitted XLA program per step (forward+backward+AdamW), batch sharded
    over the device mesh — no DDP wrapper, no epoch barriers;
  * Orbax checkpoints restore optimizer state correctly (the reference never
    did, SURVEY.md section 5.4);
  * no ``torch.autograd.set_detect_anomaly(True)`` equivalent — the
    reference leaves this perf landmine on unconditionally (``train.py:145``).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DATASET_REGISTRY, DataLoader
from ..eval.benchmarks import (
    validate_snu, validate_synthetic, validate_ucf101, validate_vimeo90k,
)
from ..models import create_model
from ..parallel import create_mesh, shard_batch
from ..utils.logger import Logger
from ..utils.flow_viz import flow_to_image
from .checkpoint import CheckpointManager, restore_teacher_params
from .preemption import PreemptionGuard
from .schedule import warmup_cosine_lr
from .state import create_train_state
from .step import make_distill_train_step, make_inference_fn, make_train_step


def _build_dataset(cfg: Config, is_train: bool = True):
    cls = DATASET_REGISTRY[cfg.data_name]
    kwargs = dict(
        root=cfg.root, crop_hw=(cfg.crop_h, cfg.crop_w),
        is_train=is_train, seed=cfg.seed,
    )
    if cfg.data_name == "Vimeo90KwFlow":
        kwargs.update(flow_dir=cfg.flow_dir, distill_bwd=cfg.distill_bwd)
    return cls(**kwargs)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model = create_model(cfg)
        self.mesh = create_mesh()
        self.n_devices = len(self.mesh.devices.ravel())

        rng = jax.random.key(cfg.seed)
        dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
        t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
        params = self.model.init(rng, dummy, dummy, t, train=True)
        self.state = create_train_state(self.model, params, cfg)
        self.num_params = sum(
            int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
        )

        if cfg.teacher_ckpt:
            # Teacher distillation (BENCH_NOTES.md round 4): build the
            # frozen teacher from this config plus ``teacher_overrides``,
            # restore its params, and train the student with the extra
            # output-space Charbonnier term. Train-time only — inference
            # and checkpoints are the plain student.
            import dataclasses as _dc

            t_cfg = (_dc.replace(cfg, **cfg.teacher_overrides)
                     if cfg.teacher_overrides else cfg)
            self.teacher = create_model(t_cfg)
            t_template = self.teacher.init(rng, dummy, dummy, t, train=True)
            self.teacher_params = restore_teacher_params(
                cfg.teacher_ckpt, self.teacher, t_template, t_cfg)
            self.teacher_params = jax.device_put(self.teacher_params)
            base_step = make_distill_train_step(
                self.model, self.teacher, cfg, self.mesh,
                cfg.distill_teacher_w)
            self.train_step = (
                lambda state, batch: base_step(
                    state, self.teacher_params, batch))
        else:
            self.teacher = None
            self.teacher_params = None
            self.train_step = make_train_step(self.model, cfg, self.mesh)
        self.infer = None  # built lazily with params bound at call time
        self._infer_train = None  # train=True forward for image summaries

        self.ckpt = CheckpointManager(cfg.log_dir)
        self.logger = Logger(cfg.log_dir, cfg.metric_summary_freq)
        self.epoch = 0
        self.best_psnr = 0.0

    # ------------------------------------------------------------------ #

    def resume(self, name: str = "latest") -> bool:
        if not self.ckpt.exists(name):
            return False
        self.state, meta = self.ckpt.restore(name, self.state)
        self.epoch = meta["epoch"]
        self.best_psnr = meta["best_psnr"]
        self.logger.total_steps = meta["step"]
        print(f"resumed from {name}: step={meta['step']} epoch={self.epoch}")
        return True

    def _inference_fn(self):
        if self.infer is None:
            model = self.model
            self.infer = jax.jit(
                lambda params, x0, x1, t: model.apply(params, x0, x1, t)
            )
        params = self.state.params
        return lambda x0, x1, t: self.infer(params, x0, x1, t)

    def validate(self) -> dict:
        results = {}
        infer = self._inference_fn()
        if "vimeo90k" in self.cfg.val_datasets:
            results.update(validate_vimeo90k(infer, self.cfg.root))
        if "ucf101" in self.cfg.val_datasets:
            results.update(validate_ucf101(infer, root=self.cfg.ucf101_root))
        if "snu" in self.cfg.val_datasets:
            results.update(validate_snu(infer, root=self.cfg.snu_root))
        if "synthetic" in self.cfg.val_datasets:
            results.update(validate_synthetic(
                infer, seed=self.cfg.seed,
                hw=(self.cfg.crop_h, self.cfg.crop_w),
            ))
        return results

    # ------------------------------------------------------------------ #

    def train(
        self,
        profile_steps: tuple[int, int] | None = None,
        preemption_guard: PreemptionGuard | None = None,
    ) -> None:
        """Run the training loop.

        Args:
          profile_steps: optional ``(start, stop)`` step interval captured
            with ``jax.profiler`` into ``<log_dir>/profile`` (the reference
            has no profiler integration at all, SURVEY.md section 5.1).
          preemption_guard: SIGTERM-to-flag bridge; a default one is
            installed when None. On preemption the loop finishes the
            in-flight step, saves ``latest`` (full optimizer state) and
            returns cleanly so ``--resume latest`` loses nothing
            (SURVEY.md section 5.3; the reference has no handling at all).
        """
        guard = preemption_guard or PreemptionGuard()
        with guard:
            self._train_loop(profile_steps, guard)

    def _train_loop(
        self,
        profile_steps: tuple[int, int] | None,
        guard: PreemptionGuard,
    ) -> None:
        cfg = self.cfg
        Path(cfg.log_dir).mkdir(parents=True, exist_ok=True)
        cfg.save_yaml(Path(cfg.log_dir) / "config.yaml")
        print(f"model {cfg.model_name}: {self.num_params} params, "
              f"{self.n_devices} devices")

        dataset = _build_dataset(cfg, is_train=True)
        global_batch = cfg.batch_size * self.n_devices
        loader = DataLoader(
            dataset, global_batch, shuffle=True, drop_last=True,
            num_workers=cfg.num_workers, seed=cfg.seed,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )

        step = int(self.state.step)
        for epoch in range(self.epoch, cfg.num_epochs):
            loader.set_epoch(epoch)
            dataset.seed(cfg.seed * 100003 + epoch)
            t_data = time.time()
            for batch in loader:
                data_time = time.time() - t_data
                t_train = time.time()

                if profile_steps is not None and step == profile_steps[0]:
                    jax.profiler.start_trace(str(Path(cfg.log_dir) / "profile"))
                sharded = shard_batch(batch, self.mesh)
                self.state, log = self.train_step(self.state, sharded)
                step += 1
                if profile_steps is not None and step == profile_steps[1]:
                    jax.profiler.stop_trace()

                metrics = {k: float(v) for k, v in log.items()}
                metrics.update({
                    "lr": float(warmup_cosine_lr(
                        step - 1, cfg.start_lr, cfg.end_lr,
                        cfg.last_lr_decay_iter, cfg.warmup_steps,
                    )),
                    "data_time": data_time,
                    "train_time": time.time() - t_train,
                })
                self.logger.push(metrics)

                if step % cfg.img_summary_freq == 0:
                    self._log_images(batch)

                if step % cfg.save_latest_freq == 0:
                    self.ckpt.save("latest", self.state,
                                   epoch=epoch, best_psnr=self.best_psnr)

                if guard.preempted:
                    self.ckpt.save("latest", self.state,
                                   epoch=epoch, best_psnr=self.best_psnr)
                    print(f"preemption signal: saved 'latest' at step {step} "
                          f"(epoch {epoch}); exiting cleanly")
                    return
                t_data = time.time()

            if (epoch + 1) % cfg.save_every_freq_epoch == 0:
                self.ckpt.save(f"epoch_{epoch + 1:03d}", self.state,
                               epoch=epoch + 1, best_psnr=self.best_psnr)

            if (epoch + 1) % cfg.valid_freq_epoch == 0 and cfg.val_datasets:
                results = self.validate()
                key = f"val/{cfg.save_best_benchmark}_psnr"
                cur = results.get(key, 0.0)
                if cur > self.best_psnr:
                    self.best_psnr = cur
                    self.ckpt.save(f"best_{cfg.save_best_benchmark}",
                                   self.state, epoch=epoch + 1,
                                   best_psnr=self.best_psnr)
                self.logger.write_dict(results, step=epoch + 1)
                print(f"Epoch {epoch + 1} Validation Done - "
                      f"Best: {self.best_psnr:.3f}")

    # ------------------------------------------------------------------ #

    def _train_outputs_fn(self):
        """Jitted ``(pred, intermediates)`` forward (train=True) for image
        summaries; separate from the eval ``infer`` which drops
        intermediates."""
        if self._infer_train is None:
            model = self.model
            self._infer_train = jax.jit(
                lambda params, x0, x1, t: model.apply(
                    params, x0, x1, t, train=True)
            )
        return self._infer_train

    @staticmethod
    def _flow_strip(flows, full_hw: tuple[int, int]) -> np.ndarray:
        """Render a list of (H', W', 2) flow maps side by side at full
        resolution (nearest upscale; visualization only)."""
        H, W = full_hw
        panels = []
        for f in flows:
            img = flow_to_image(np.asarray(f, np.float32))
            ry, rx = H // img.shape[0], W // img.shape[1]
            if ry > 1 or rx > 1:
                img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
            panels.append(img[:H, :W])
        return np.concatenate(panels, axis=1)

    def _log_images(self, batch: dict) -> None:
        """Prediction strip [avg | pred | gt | err] + the 10-panel flow
        pyramid [ft0_4..ft0_1 | pseudo-GT ft0, ft1 | ft1_1..ft1_4]
        (reference ``models/DAT.py:40-72``)."""
        try:
            x0 = jnp.asarray(batch["x0"][:1])
            x1 = jnp.asarray(batch["x1"][:1])
            t = jnp.asarray(batch["t"][:1])
            H, W = x0.shape[1], x0.shape[2]

            out = self._train_outputs_fn()(self.state.params, x0, x1, t)
            inter: dict = {}
            if isinstance(out, tuple):
                pred, inter = out[0], out[1]
            else:
                pred = out
            pred = np.asarray(pred, np.float32)[0]

            x0n, x1n = np.asarray(x0[0]), np.asarray(x1[0])
            xt = batch["xt"][0]
            half = (x0n + x1n) / 2
            err = np.abs(xt - pred)
            strip = np.concatenate([half, pred, xt, err], axis=1)
            panels = {"pred": strip}

            # Predicted flow pyramids (coarse->fine for t->0, then the
            # pseudo-GT pair, then fine->coarse for t->1), exactly the
            # reference's viz_flow layout (models/DAT.py:66-68).
            p0 = inter.get("pred_ft0", inter.get("ft0"))
            p1 = inter.get("pred_ft1", inter.get("ft1"))
            if p0 is not None and "f0x" in batch:
                flows = (list(reversed(list(p0)))
                         + [batch["f0x"][0], batch["f1x"][0]]
                         + list(p1))
                flows = [f[0] if getattr(f, "ndim", 3) == 4 else f
                         for f in flows]
                panels["flow"] = self._flow_strip(flows, (H, W))
            elif "f0x" in batch:
                panels["flow"] = self._flow_strip(
                    [batch["f0x"][0], batch["f1x"][0]], (H, W))
            self.logger.add_image_summary(panels)
        except Exception as e:  # logging must never kill training
            print(f"image summary failed: {e}")
