"""Jitted training / inference steps over a data-parallel mesh.

One compiled XLA program per step: forward, loss, backward, AdamW update.
Parameters are replicated, the batch is sharded on its leading axis; XLA
inserts the gradient all-reduce over the mesh's ICI links (the TPU
equivalent of DDP's bucketed NCCL all-reduce, ``Trainer.py:75``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.dat import DATwConstantnC, dat_loss
from ..models.dat_tpu import DATwConstantnCTPU
from ..models.ifrnet import IFRNet, ifrnet_loss
from ..models.m2m import GMM2M, IFRM2M, m2m_loss
from ..models.gmtrans import GMTrans, gmtrans_loss
from ..models.rstt import RSTT, rstt_loss
from ..models.dcntrans import DCNTrans, dcntrans_loss
from ..models.dcndat import DCNDAT, dcndat_loss
from ..models.madat import MADAT, madat_loss
from ..models.gmbase import (
    FFCRAFT, GMVFIFormer, LAMAResidual, RAFTRefine,
    gmbase_loss, raftrefine_loss,
)
from ..parallel import batch_sharding, replicated_sharding
from .state import TrainState


def make_loss_fn(model, cfg: Config) -> Callable:
    """Model-specific ``loss_fn(params, batch) -> (loss, log_dict)``."""
    if isinstance(model, (DATwConstantnC, DATwConstantnCTPU)):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return dat_loss(pred, inter, batch, cfg.distill_lambda)

        return loss_fn

    if isinstance(model, IFRNet):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            gt_feats = model.apply(
                params, batch["xt"] - inter["mean"], method=IFRNet.encode
            )
            return ifrnet_loss(
                pred, inter, batch, gt_feats,
                geo_lambda=cfg.geo_lambda,
                distill_lambda=(
                    cfg.distill_lambda if cfg.distill_lambda is not None else 0.0
                ),
            )

        return loss_fn

    if isinstance(model, (IFRM2M, GMM2M)):
        align_corners = isinstance(model, GMM2M)

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return m2m_loss(pred, inter, batch, align_corners=align_corners)

        return loss_fn

    if isinstance(model, GMTrans):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return gmtrans_loss(pred, inter, batch)

        return loss_fn

    if isinstance(model, RSTT):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return rstt_loss(model, params, pred, inter, batch)

        return loss_fn

    if isinstance(model, DCNTrans):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return dcntrans_loss(model, params, pred, inter, batch)

        return loss_fn

    if isinstance(model, DCNDAT):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return dcndat_loss(model, params, pred, inter, batch,
                               geo_lambda=cfg.geo_lambda,
                               distill_lambda=cfg.distill_lambda)

        return loss_fn

    if isinstance(model, MADAT):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return madat_loss(pred, inter, batch)

        return loss_fn

    if isinstance(model, RAFTRefine):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return raftrefine_loss(
                pred, inter, batch,
                distill_lambda=(
                    cfg.distill_lambda if cfg.distill_lambda is not None
                    else 0.0
                ),
            )

        return loss_fn

    if isinstance(model, (LAMAResidual, FFCRAFT, GMVFIFormer)):

        def loss_fn(params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            return gmbase_loss(pred, inter, batch)

        return loss_fn

    raise ValueError(f"no loss defined for model {type(model).__name__}")


def make_train_step(model, cfg: Config, mesh) -> Callable:
    """Compiled ``train_step(state, batch) -> (new_state, log_dict)``."""
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch):
        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        new_state = state.apply_gradients(grads=grads)
        return new_state, log

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_chunked_train_step(model, cfg: Config, mesh, chunk: int) -> Callable:
    """Compiled ``chunked_step(state, batches) -> (new_state, logs)``.

    Runs ``chunk`` optimizer steps inside ONE dispatch via ``lax.scan`` —
    per-step math is identical to :func:`make_train_step` (same op order,
    same schedule via ``state.step``), so loss/PSNR curves are directly
    comparable with the unchunked loop. ``batches`` is a pytree whose
    leaves have leading shape ``(chunk, B, ...)``; the batch axis (axis 1)
    is sharded over the mesh. ``logs`` leaves come back stacked ``(chunk,)``.

    Why: on the tunneled single-chip backend each dispatch costs ~25 ms and
    every per-step scalar fetch blocks the pipeline; scanning K steps per
    dispatch amortizes both (measured ~0.33 s/step -> ~0.05 s/step for the
    quality-study trainer at K=20). On real multi-chip hardware it is the
    standard XLA multi-step trick (no host round-trip between steps).
    """
    loss_fn = make_loss_fn(model, cfg)

    def one_step(state: TrainState, batch):
        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return state.apply_gradients(grads=grads), log

    def chunked_step(state: TrainState, batches):
        return jax.lax.scan(one_step, state, batches, length=chunk)

    repl = replicated_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    data = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(
        chunked_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_pool_chunked_train_step(
    model, cfg: Config, mesh, chunk: int
) -> Callable:
    """Compiled ``step(state, pool, idx) -> (new_state, logs)`` gathering
    batches from an ON-DEVICE sample pool.

    The quality-study trainer's fixed scene pool (~650 MB fp32 at the
    standard 768x128x128 setting) fits HBM outright, so instead of
    shipping every batch through the tunnel (~136 MB per 20-step chunk at
    ~20 MB/s — measured as the round-4 arm bottleneck), the pool is
    device_put ONCE and each chunk transfers only its ``(chunk, B)`` int32
    index matrix. The gathered batches are bit-identical to host-streamed
    ones (same pool values, same index stream), so curves stay comparable
    with the round-2/3 protocol.
    """
    loss_fn = make_loss_fn(model, cfg)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    data = NamedSharding(mesh, P(DATA_AXIS))

    def one_step(pool, state: TrainState, idx):
        batch = jax.tree_util.tree_map(lambda p: p[idx], pool)
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree_util.tree_map(lambda _: data, batch)
        )
        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return state.apply_gradients(grads=grads), log

    def chunked_step(state: TrainState, pool, idx):
        return jax.lax.scan(
            lambda s, i: one_step(pool, s, i), state, idx, length=chunk
        )

    repl = replicated_sharding(mesh)
    return jax.jit(
        chunked_step,
        in_shardings=(repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_distill_loss_fn(
    model, teacher, cfg: Config, distill_w: float
) -> Callable:
    """``loss_fn(params, teacher_params, batch) -> (loss, log)`` adding
    output-space teacher distillation to the model's own recipe.

    The teacher (typically the exact-parity flagship) runs under
    ``stop_gradient`` — train-time-only cost, inference untouched. The
    added term is ``distill_w * Charbonnier(pred_student - pred_teacher)``,
    the same robust penalty the reference uses for its internal
    flow-distillation losses (``modules/losses.py:11-30``), applied in
    output space. Recovery attempt for the fast config's ~0.3 dB
    horizon gap (BENCH_NOTES.md round 3).
    """
    from ..ops.losses import charbonnier_l1

    if isinstance(model, (DATwConstantnC, DATwConstantnCTPU)):

        def loss_fn(params, teacher_params, batch):
            pred, inter = model.apply(
                params, batch["x0"], batch["x1"], batch["t"], train=True
            )
            total, log = dat_loss(pred, inter, batch, cfg.distill_lambda)
            t_pred = jax.lax.stop_gradient(
                teacher.apply(teacher_params, batch["x0"], batch["x1"],
                              batch["t"])
            )
            t_loss = distill_w * charbonnier_l1(pred - t_pred)
            total = total + t_loss
            log = dict(log)
            log["teacher_loss"] = t_loss
            log["total_loss"] = total
            return total, log

        return loss_fn

    raise ValueError(
        f"no distillation recipe for model {type(model).__name__}"
    )


def make_distill_train_step(
    model, teacher, cfg: Config, mesh, distill_w: float
) -> Callable:
    """Compiled ``train_step(state, teacher_params, batch)`` — the
    production (``Trainer``) counterpart of :func:`make_train_step` with
    the :func:`make_distill_loss_fn` teacher term. Teacher params are a
    replicated, non-donated argument (frozen; never updated)."""
    loss_fn = make_distill_loss_fn(model, teacher, cfg, distill_w)

    def train_step(state: TrainState, teacher_params, batch):
        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch
        )
        return state.apply_gradients(grads=grads), log

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_distill_pool_chunked_step(
    model, teacher, cfg: Config, mesh, chunk: int, distill_w: float
) -> Callable:
    """Compiled ``step(state, teacher_params, pool, idx) -> (state, logs)``.

    :func:`make_pool_chunked_train_step` with a frozen teacher: ``chunk``
    optimizer steps per dispatch over an on-device sample pool, each step
    adding the :func:`make_distill_loss_fn` teacher term. Teacher params
    are an ordinary (replicated, non-donated) argument, so the caller can
    swap teachers without recompiling the student state structure.
    """
    loss_fn = make_distill_loss_fn(model, teacher, cfg, distill_w)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    data = NamedSharding(mesh, P(DATA_AXIS))

    def one_step(pool, tparams, state: TrainState, idx):
        batch = jax.tree_util.tree_map(lambda p: p[idx], pool)
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree_util.tree_map(lambda _: data, batch)
        )
        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, tparams, batch
        )
        return state.apply_gradients(grads=grads), log

    def chunked_step(state: TrainState, tparams, pool, idx):
        return jax.lax.scan(
            lambda s, i: one_step(pool, tparams, s, i), state, idx,
            length=chunk,
        )

    repl = replicated_sharding(mesh)
    return jax.jit(
        chunked_step,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_inference_fn(model, mesh=None) -> Callable:
    """Compiled ``infer(params, x0, x1, t) -> pred`` (eval / serving path)."""

    def infer(params, x0, x1, t):
        return model.apply(params, x0, x1, t)

    if mesh is None:
        return jax.jit(infer)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        infer,
        in_shardings=(repl, data, data, data),
        out_shardings=data,
    )
