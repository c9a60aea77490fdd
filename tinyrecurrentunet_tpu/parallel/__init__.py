"""Parallelism (SPMD over a jax.sharding.Mesh).

Replaces the reference's entire hand-rolled NCCL layer — per-GPU process
launcher, param broadcast, bucketed gradient all-reduce hooks (reference
`distributed.py:42-189`) — with compiler-scheduled collectives: the train
step is jitted once over a device mesh with the batch sharded on the `data`
axis and state replicated; XLA inserts the gradient/BN-stat psums over ICI.
"""

from tinyrecurrentunet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
