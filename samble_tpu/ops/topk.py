"""Partition-safe top-k selection.

``jax.lax.top_k`` lowers to XLA's TopK custom-call, which the SPMD
partitioner cannot partition: under a >1-device mesh the WHOLE operand is
all-gathered to every device and the selection runs fully replicated.
Measured on an 8-device mesh (tests/test_sharding.py HLO inspection): the
(B, N, N) kNN distance tensor — the largest intermediate in the model —
crossed the mesh as ``all-gather`` before every EdgeConv / N2P /
DownSample ``top_k``, i.e. O(B·N²) ICI traffic per layer plus 8× redundant
selection work.  ``Sort``, by contrast, partitions cleanly on non-sort
dimensions (zero collectives for a batch-sharded operand).

``top_k`` below therefore dispatches:

  * single-device (the default): ``lax.top_k`` — O(N log K) selection,
    fastest on one chip;
  * SPMD mode (flipped by :func:`samble_tpu.parallel.make_mesh` when the
    mesh spans >1 device): a stable descending sort + slice — O(N log N)
    locally but zero cross-device traffic.

Tie behavior matches ``lax.top_k`` (equal values → lower index first):
the sort uses the negated scores ascending with a stable comparator.

Reference parity note: the reference never faces this choice —
``torch.topk`` runs per-GPU on already-local tensors under DDP
(utils/ops.py:35-43).  The global-view jit design recovers that locality
through the partitioner, which is exactly why the selection op must be
partitionable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPMD = False


def set_spmd(flag: bool) -> None:
    """Enable sort-based (partitionable) top-k.  Called by
    ``parallel.make_mesh`` for >1-device meshes; safe to call any time
    before the step functions are traced."""
    global _SPMD
    _SPMD = bool(flag)


def spmd_enabled() -> bool:
    return _SPMD


def top_k(x: jax.Array, k: int):
    """Drop-in for ``jax.lax.top_k`` (values, indices) that stays
    partitionable under a sharded mesh (see module docstring)."""
    if not _SPMD:
        return jax.lax.top_k(x, k)
    n = x.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    # ascending stable sort of -x == descending by x, ties → lower index
    neg_sorted, idx = jax.lax.sort((-x, iota), num_keys=1, is_stable=True)
    return -neg_sorted[..., :k], idx[..., :k]
