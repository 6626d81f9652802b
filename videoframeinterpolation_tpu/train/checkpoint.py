"""Orbax checkpointing (replaces ``torch.save`` dicts, ``Trainer.py:43-54``).

Saves the full TrainState pytree (params + optimizer state + step) plus
scalar metadata atomically. Fixes the reference's silent optimizer-state
loss on resume (``Trainer.py:28-29`` loads key ``'optim'`` but ``:52``
saves ``'optimizer'`` — SURVEY.md section 5.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Cadenced checkpoints: ``latest`` (every N steps), ``epoch_XXX``
    (every M epochs), ``best_<benchmark>`` on metric improvement —
    the reference's scheme (``train.py:95-102,122-125``)."""

    def __init__(self, log_dir: str):
        self.dir = Path(log_dir).absolute() / "checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _meta_path(self, name: str) -> Path:
        return self.dir / f"{name}.meta.json"

    def save(self, name: str, state, *, epoch: int, best_psnr: float) -> None:
        path = self.dir / name
        target = {"params": state.params, "opt_state": state.opt_state}
        self._ckptr.save(path, target, force=True)
        self._ckptr.wait_until_finished()
        meta = {
            "step": int(state.step),
            "epoch": int(epoch),
            "best_psnr": float(best_psnr),
        }
        self._meta_path(name).write_text(json.dumps(meta))

    def restore(self, name: str, state) -> tuple[Any, dict]:
        """Restore into the structure of ``state``; returns
        ``(new_state, meta)``."""
        path = self.dir / name
        target = {"params": state.params, "opt_state": state.opt_state}
        restored = self._ckptr.restore(path, target)
        meta = json.loads(self._meta_path(name).read_text())
        new_state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=meta["step"],
        )
        return new_state, meta

    def exists(self, name: str) -> bool:
        return (self.dir / name).exists() and self._meta_path(name).exists()


def restore_teacher_params(path: str, teacher_model, teacher_params,
                           teacher_cfg) -> Any:
    """Restore frozen teacher parameters for distillation training.

    Accepts either checkpoint format this framework writes:
      * an Orbax checkpoint **directory** (a ``CheckpointManager`` save,
        e.g. ``exps/<exp>/checkpoints/best_vimeo90k``);
      * a flax msgpack TrainState **file** (a
        ``tools/quality/head_to_head.py`` ``.ckpt`` / ``.best.ckpt``).

    ``teacher_params`` is an init-shaped template (the restore target
    structure); only the params are returned — the teacher's optimizer
    state is discarded.
    """
    from .state import create_train_state

    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"teacher_ckpt not found: {path}")
    state = create_train_state(teacher_model, teacher_params, teacher_cfg)
    if p.is_dir():
        ckptr = ocp.StandardCheckpointer()
        target = {"params": state.params, "opt_state": state.opt_state}
        return ckptr.restore(p.absolute(), target)["params"]
    import flax.serialization as fser

    return fser.from_bytes(state, p.read_bytes()).params
