"""Multi-host simulation: sharded data loading + split-mesh train parity.

The reference assumes DDP correctness (SURVEY.md section 4: "no
distributed-test story"); here both halves of the multi-host path are
simulated on the virtual 8-CPU-device mesh:

  * the loader's ``shard_index``/``num_shards`` contract (the
    ``DistributedSampler`` replacement, reference ``train.py:54-56``);
  * a train step on a 2-host-style device split (4+4) matching the
    single-host 8-device step bit-for-bit in loss (same global batch).
"""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.data import DataLoader
from videoframeinterpolation_tpu.data.synthetic import SyntheticMotion
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel import create_mesh, shard_batch
from videoframeinterpolation_tpu.train import (
    create_train_state,
    make_train_step,
)


class _IndexDataset:
    """Items are their own index — makes coverage assertions exact."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i])}


def _collect(loader):
    idx = []
    for batch in loader:
        idx.extend(int(v) for v in batch["idx"].ravel())
    return idx


def test_two_shards_disjoint_and_balanced():
    n = 37  # not divisible by shards or batch: exercises padding
    loaders = [
        DataLoader(_IndexDataset(n), 4, shuffle=True, drop_last=True,
                   num_workers=1, seed=3, shard_index=k, num_shards=2)
        for k in (0, 1)
    ]
    for epoch in (0, 1):
        for ld in loaders:
            ld.set_epoch(epoch)
        seen = [_collect(ld) for ld in loaders]
        # Equal batch counts (lockstep across hosts — no deadlock).
        assert len(loaders[0]) == len(loaders[1])
        assert len(seen[0]) == len(seen[1])
        # Disjoint except for DistributedSampler-style pad duplicates.
        s0, s1 = set(seen[0]), set(seen[1])
        overlap = s0 & s1
        assert len(overlap) <= 1  # 37 -> one padded duplicate at most
        # Together they cover (almost) everything that fits in full batches.
        assert len(s0 | s1) >= 2 * 4 * len(loaders[0]) - 1


def test_shard_reshuffles_differ_per_epoch():
    ld = DataLoader(_IndexDataset(32), 4, shuffle=True, drop_last=True,
                    num_workers=1, seed=0, shard_index=0, num_shards=2)
    ld.set_epoch(0)
    e0 = _collect(ld)
    ld.set_epoch(1)
    e1 = _collect(ld)
    assert e0 != e1
    assert sorted(set(e0)) != sorted(set(e1)) or e0 != e1


def test_split_mesh_train_step_matches_full_mesh():
    """One optimizer step with the global batch spread over a 4-device
    'host A' + 4-device 'host B' mesh must equal the 8-device step: the
    psum gradient all-reduce is mean-over-global-batch either way."""
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides 8 virtual CPU devices"

    cfg = Config(model_name="IFRNet", compute_dtype="float32",
                 distill_lambda=0.01)
    model = create_model(cfg)

    ds = SyntheticMotion(crop_hw=(32, 32), seed=5, num_items=8)
    items = [ds[i] for i in range(8)]
    batch = {k: np.stack([it[k] for it in items]) for k in items[0]}

    params = model.init(
        jax.random.key(0), jnp.asarray(batch["x0"][:1]),
        jnp.asarray(batch["x1"][:1]), jnp.asarray(batch["t"][:1]),
        train=True,
    )

    def run(mesh):
        # Fresh buffers per run: the jitted step donates the state, which
        # would delete a shared params pytree after the first call.
        own = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                     params)
        state = create_train_state(model, own, cfg)
        step = make_train_step(model, cfg, mesh)
        new_state, log = step(state, shard_batch(batch, mesh))
        return float(log["total_loss"]), new_state.params

    loss8, p8 = run(create_mesh(8))
    # Emulate the 2-host layout: the same 8 devices in host-interleaved
    # order (host A = even slots, host B = odd slots) — batch shards land
    # on different physical devices than in the 1x8 mesh.
    import numpy as _np
    from jax.sharding import Mesh

    perm = [0, 4, 1, 5, 2, 6, 3, 7]
    mesh2x4 = Mesh(_np.asarray([devs[i] for i in perm]), ("data",))
    loss2x4, p2x4 = run(mesh2x4)

    assert np.isclose(loss8, loss2x4, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p2x4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
