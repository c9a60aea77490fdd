"""Device mesh and sharding helpers.

Design (SURVEY.md §2.3): the model is ~380k params, so data parallelism is
the production strategy — params replicated, batch sharded over the `data`
axis, gradient reduction compiler-inserted over ICI (multi-host: over DCN
after `jax.distributed.initialize`). Tensor/pipeline parallelism are not
needed at this scale; the mesh API below still accepts extra axes so larger
variants can shard (see dryrun_multichip in __graft_entry__.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinyrecurrentunet_tpu.config import DistConfig


def initialize_distributed(cfg: DistConfig) -> None:
    """Multi-host bring-up: one process per host, DCN-coordinated.

    Replaces the reference's per-GPU Popen launcher + NCCL TCP rendezvous
    (reference `distributed.py:48-58,150-176`).
    """
    if cfg.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
        )


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices.

    Raises when fewer devices exist than requested — silently truncating
    let round 1's multichip dryrun fail as a confusing late assert
    (MULTICHIP_r01.json) instead of a clear error at mesh construction.
    """
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) exist "
                f"(platform={devices[0].platform!r}); set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{num_devices} JAX_PLATFORMS=cpu before the backend "
                "initializes, or run on real hardware"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host-local batch pytree onto the mesh, sharded on dim 0.

    Single-process: device_put the whole batch sharded across local devices.
    Multi-process (after `jax.distributed.initialize`): each process holds
    only ITS rows; assemble the global array from the per-process shards —
    the SPMD analog of the reference's DistributedSampler + per-rank batches
    (reference `dataset.py:406-408`, `train.py:124-125`).
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, batch)
