"""Chunked (lax.scan) train step equals the sequential per-step loop.

``make_chunked_train_step`` exists so the tunneled single-chip backend
can amortize per-dispatch overhead in the quality-study trainer
(``tools/quality/head_to_head.py``); its per-step math must be identical
to ``make_train_step`` or the chunked curves stop being comparable with
the round-2/3 unchunked ones.
"""

import numpy as np
import jax

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel import (
    create_mesh, shard_batch, shard_chunk,
)
from videoframeinterpolation_tpu.train import (
    create_train_state,
    make_chunked_train_step,
    make_pool_chunked_train_step,
    make_train_step,
)

from test_train_step import _batch, _tiny_cfg


def test_chunked_step_matches_sequential():
    cfg = _tiny_cfg()
    model = create_model(cfg)
    mesh = create_mesh(8)
    K = 3
    batches = [_batch(8, seed=s) for s in range(K)]

    init_batch = jax.tree_util.tree_map(lambda x: x[:1], batches[0])
    params = model.init(
        jax.random.key(0), init_batch["x0"], init_batch["x1"],
        init_batch["t"], train=True,
    )

    # All three step fns donate their input state; give each its own
    # buffers.
    params_chk = jax.tree_util.tree_map(lambda x: x.copy(), params)
    params_pool = jax.tree_util.tree_map(lambda x: x.copy(), params)

    state_seq = create_train_state(model, params, cfg)
    step_fn = make_train_step(model, cfg, mesh)
    seq_losses = []
    for b in batches:
        state_seq, log = step_fn(state_seq, shard_batch(b, mesh))
        seq_losses.append(float(log["total_loss"]))

    state_chk = create_train_state(model, params_chk, cfg)
    chunk_fn = make_chunked_train_step(model, cfg, mesh, K)
    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    state_chk, logs = chunk_fn(state_chk, shard_chunk(stacked, mesh))

    assert int(state_chk.step) == K
    np.testing.assert_allclose(
        np.asarray(logs["total_loss"]), np.asarray(seq_losses),
        rtol=1e-5, atol=1e-7,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_seq.params),
        jax.tree_util.tree_leaves(state_chk.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )

    # Pool variant: the K batches live in a device pool of 2K items, each
    # scan step gathering its batch by index — must match too.
    pool = {
        k: np.concatenate([b[k] for b in batches]) for k in batches[0]
    }
    idx = np.arange(K * 8, dtype=np.int32).reshape(K, 8)
    state_p = create_train_state(model, params_pool, cfg)
    pool_fn = make_pool_chunked_train_step(model, cfg, mesh, K)
    state_p, logs_p = pool_fn(state_p, jax.device_put(pool), idx)
    np.testing.assert_allclose(
        np.asarray(logs_p["total_loss"]), np.asarray(seq_losses),
        rtol=1e-5, atol=1e-7,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_seq.params),
        jax.tree_util.tree_leaves(state_p.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
