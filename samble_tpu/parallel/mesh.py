"""Device mesh + sharding helpers — the framework's entire "DDP layer".

The reference's distributed backbone is ~400 lines of process spawning,
NCCL rendezvous, DistributedSampler plumbing and hand-placed collectives
(SURVEY.md §2.2).  The TPU-native equivalent is this file: build a
``jax.sharding.Mesh`` over all devices, shard batches over the ``data``
axis, replicate parameters, and let XLA insert every collective:

  * gradient sync       — mean over the globally-sharded batch
  * metric all_gather   — outputs addressable per shard
  * SyncBN / bin-boundary sync — global reductions inside the jitted step

Multi-host extension: call ``jax.distributed.initialize()`` before
``make_mesh`` and the same code spans hosts (the mesh just gets more
devices); nothing else changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(cfg: Any) -> bool:
    """Multi-host process-group init behind config flags.

    Reference parity: ``train.ddp.nnodes`` / ``world_size`` / master
    address knobs (configs/default.yaml:95-100, rendezvous at
    train_modelnet.py:162-166).  On TPU pods the coordinator/process
    counts usually come from the environment, so a bare
    ``train.ddp.multi_host=true`` defers to ``jax.distributed.initialize()``
    auto-detection; the explicit knobs are forwarded when set.  Single-host
    behavior is unchanged (flag defaults off).  Returns True if initialized.
    """
    ddp = cfg.select("train.ddp") if hasattr(cfg, "select") else None
    if ddp is None or not bool(ddp.get("multi_host", False)):
        return False
    kwargs = {}
    addr = ddp.get("master_addr")
    port = ddp.get("master_port")
    if addr:
        kwargs["coordinator_address"] = f"{addr}:{port or 1234}"
    if ddp.get("world_size"):
        kwargs["num_processes"] = int(ddp.get("world_size"))
    if ddp.get("rank") is not None and ddp.get("world_size"):
        kwargs["process_id"] = int(ddp.get("rank"))
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put every array in ``batch`` with its leading axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        state,
    )
