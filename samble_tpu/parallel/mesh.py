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

import functools
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
    """1-D data-parallel mesh over all (or the given) devices.

    Spanning more than one device also switches the op library to its
    partition-safe top-k (``ops/topk.py``): XLA's TopK custom-call cannot
    be partitioned and would all-gather the (B, N, N) kNN distance tensor
    to every device; the sort-based selection partitions with zero
    collectives.  The flag must be set before the step functions are
    traced, which building the mesh first guarantees.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    mesh = Mesh(devices, (axis_name,))
    if devices.size > 1:
        from samble_tpu.kernels import spmd
        from samble_tpu.ops import topk

        topk.set_spmd(True)
        # Pallas kernels also need explicit SPMD dispatch (kernels/spmd.py):
        # without it GSPMD replicates every kernel call across the mesh
        spmd.install_mesh(mesh, axis_name)
    return mesh


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put every array in ``batch`` with its leading axis sharded.

    Works at any process count: every process holds the same full global
    batch (the loaders are seeded identically across processes, mirroring
    the reference's DistributedSampler determinism,
    train_modelnet.py:208-209); under multi-process each process
    materializes only the shards it owns via ``make_array_from_callback``.
    """
    sharding = batch_sharding(mesh, axis_name)
    if mesh.devices.size == len([d for d in mesh.devices.flat
                                 if d.process_index == jax.process_index()]):
        # single-process fast path
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(put, batch)


def wait_at_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier (NOT a device collective).

    Goes through the distributed runtime client (the same service
    ``jax.distributed.initialize`` rendezvouses on), so it carries a
    configurable, generous timeout — unlike Gloo context initialization,
    whose KV lookups time out after a hardcoded 30 s.  No-op single-process.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


class BarrierOnFirstCall:
    """Compile-then-sync wrapper for multi-process first executions.

    On a cold compilation cache, two processes' first executions of a big
    jitted step can skew by minutes (one hits a warm persistent cache, the
    other compiles from scratch).  The laggard then misses Gloo's hardcoded
    30 s rendezvous window for the collective's context init and the run
    dies with ``GetKeyValue() timed out``.  Fix: on the FIRST call under
    ``process_count > 1``, AOT-compile the step for the given args (no
    execution, so no collective), then meet at a named coordination-service
    barrier, then dispatch — every process enters the collective within the
    barrier's skew, not the compiler's.  Single-process: passthrough.
    """

    def __init__(self, fn, name: str):
        self._fn = fn
        self._name = name
        self._pending = jax.process_count() > 1

    def __call__(self, *args):
        if self._pending:
            self._fn.lower(*args).compile()
            wait_at_barrier(f"first-call/{self._name}")
            self._pending = False
        return self._fn(*args)


@functools.lru_cache(maxsize=None)
def _replicator(mesh: Mesh):
    """One cached jitted identity per mesh (a fresh ``jax.jit(lambda ...)``
    per fetch would retrace + recompile the all-gather on every call)."""
    return jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))


def fetch(x: Any) -> Any:
    """``np.asarray`` of a possibly cross-process-sharded output pytree.

    The reference all_gathers predictions/labels to every rank each step
    (train_modelnet.py:375-377).  Here: arrays whose shards live on
    non-addressable devices are all-gathered to a fully-replicated layout
    with one jitted identity (XLA inserts the collective), then read out.
    Single-process arrays take the plain ``np.asarray`` path — no copy, no
    collective.
    """

    def one(a):
        if isinstance(a, jax.Array) and not (
            a.is_fully_addressable or a.is_fully_replicated
        ):
            a = _replicator(a.sharding.mesh)(a)
        return np.asarray(a)

    return jax.tree_util.tree_map(one, x)


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        state,
    )
