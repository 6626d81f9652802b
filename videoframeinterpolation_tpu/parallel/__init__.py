"""Device mesh + sharding utilities (replaces the reference's NCCL/DDP stack).

The reference's only parallelism is data-parallel DDP over NCCL
(``Trainer.py:19``, ``utils/env.py:13``). Here, data parallelism is a
1-D ``jax.sharding.Mesh`` over all local+remote devices: parameters are
replicated, the batch is sharded on its leading axis, and XLA inserts the
gradient all-reduce (psum over ICI) automatically inside the jitted train
step — no explicit collectives, no barriers (XLA steps are synchronous).
"""

from .mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_chunk,
)
from .spatial import make_sharded_infer, make_tiled_infer, tiled_inference

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_chunk",
    "make_sharded_infer",
    "make_tiled_infer",
    "tiled_inference",
]
