"""Data-parallel dispatch of the Pallas kernels under a device mesh.

``pallas_call`` has no SPMD partitioning rule: under a >1-device mesh,
GSPMD falls back to ALL-GATHERING every operand and running the kernel
fully replicated on every device (measured on an 8-device host mesh:
the compiled program contains an ``all-gather`` of the full batch and
the output comes back unsharded).  On a real multi-chip TPU that means
O(B·N·C) ICI traffic per kernel call plus mesh-size× redundant compute —
the kernels would *undo* the data parallelism the mesh provides.

Every kernel in this package is embarrassingly batch-parallel (the grid's
leading axis is the batch; no cross-batch interaction), so the fix is
mechanical: when the parallel layer has installed a mesh
(``parallel.make_mesh`` with >1 device), each public kernel entry runs
under ``shard_map`` over the batch axis.  Inside the shard the kernel
sees the local batch; outputs come back batch-sharded; XLA inserts zero
collectives.  Single-device behavior is bit-identical (the wrapper is a
passthrough).

Differentiation: ``shard_map`` composes with ``jax.custom_vjp`` (the
gather/scatter and N2P kernels), so the fused backward kernels get the
same per-shard treatment.

Fallback: batches not divisible by the mesh size run the unwrapped
(replicated) path — correct, just not scaled.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

_MESH: Optional[Mesh] = None
_AXIS: str = "data"


def install_mesh(mesh: Optional[Mesh], axis_name: str = "data") -> None:
    """Make ``mesh`` the ambient mesh for kernel dispatch (None clears)."""
    global _MESH, _AXIS
    _MESH = mesh
    _AXIS = axis_name


def active_mesh() -> Optional[Mesh]:
    return _MESH


def data_parallel(fn, n_batched: int, n_replicated: int = 0,
                  axis_arg_index: int = None,
                  out_specs_fn=None):
    """Wrap a kernel entry: the first ``n_batched`` positional args are
    batch-sharded over the ambient mesh; the next ``n_replicated`` are
    REAL shard_map inputs with replicated specs (use this for any
    *differentiable* non-batched arg — weights in the closure would not
    get their cotangents reduced across devices); everything else (static
    ints/floats, stop-grad arrays) rides in the closure.  When
    ``axis_arg_index`` is set, that positional arg (an ``axis_name`` slot
    the caller passes as None) is replaced with the mesh axis name inside
    the shard — kernels with cross-batch couplings (slab_chain_knn's BN
    moment corrections) psum through it.

    ``out_specs_fn(axis_name)`` — when set, builds the shard_map out_specs
    pytree (matching the kernel's output structure) so kernels whose
    outputs are NOT all batch-sharded can mark replicated leaves with
    ``P()`` (slab_chain_knn's pmean'd BN moments mu1/var1: under the
    default all-``P(axis)`` specs they came back concatenated to
    (ndev·C,) and broke every Pallas train step on a >1-device mesh).
    Default: every output leaf batch-sharded."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        mesh = _MESH
        batched = args[:n_batched]
        b = batched[0].shape[0] if hasattr(batched[0], "shape") else None
        if (
            mesh is None
            or mesh.size <= 1
            or b is None
            or b % mesh.size != 0
        ):
            return fn(*args, **kwargs)
        if axis_arg_index is not None:
            # The axis slot must become a REAL positional arg inside the
            # shard (custom_vjp nondiff_argnums are positional); accept the
            # caller leaving it to its default or passing it as a kwarg —
            # silently running without the axis would give per-shard
            # (non-sync) BN moments with no error.
            kwargs.pop("axis_name", None)
            if len(args) > axis_arg_index:
                args = (args[:axis_arg_index] + (_AXIS,)
                        + args[axis_arg_index + 1:])
            elif len(args) == axis_arg_index:
                args = args + (_AXIS,)
            else:
                raise TypeError(
                    f"{fn.__name__}: under a mesh every positional arg up "
                    f"to the axis slot (index {axis_arg_index}) must be "
                    f"passed explicitly; got only {len(args)}"
                )
        mapped = args[:n_batched + n_replicated]
        rest = args[n_batched + n_replicated:]

        def inner(*mapped_args):
            return fn(*mapped_args, *rest, **kwargs)

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(_AXIS),) * n_batched + (P(),) * n_replicated,
            out_specs=(P(_AXIS) if out_specs_fn is None
                       else out_specs_fn(_AXIS)),
            check_vma=False,
        )(*mapped)

    wrapper.__wrapped_kernel__ = fn  # escape hatch for tests/tools
    return wrapper
