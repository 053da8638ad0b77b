"""Neighbor gather/scatter as one-hot MXU matmuls (the Mosaic gather idiom).

XLA lowers ``points[idx]`` over the point axis to a serial TPU gather; at
training shapes (B=64, N=1024, K=32, C=64) that single gather dominates the
EdgeConv train path (measured: the full gather chain runs ~10x slower than
the fused eval kernel, see docs/kernels.md).  Here the gather is K one-hot
matmuls per row tile — MXU work at full rate, and the output is written
densely.

Layout: the kernel produces ``(B, K, N, C)`` (K-first) so each extraction
round writes one contiguous ``(TILE, C)`` slab.  ``gather_neighbors``
returns the conventional ``(B, N, K, C)`` via a transpose XLA fuses into
consumers; the EdgeConv train path consumes K-first directly and skips it.

Gather and scatter are linear and mutually transposed, so each is the
other's VJP — gradients get the same MXU treatment as the forward
(the reference's backward hits torch's scatter-add instead,
utils/ops.py:5-14 consumers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_for(n: int) -> int:
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


def _gather_kernel(w_ref, idx_ref, out_ref, *, knn_k: int):
    """out[0, k, t, :] = w[idx[t, k], :] for one (batch, row-tile) cell.

    w_ref:   (1, M, C)     full reference point set
    idx_ref: (1, TILE, K)  neighbor indices (< M) of the tile rows
    out_ref: (1, K, TILE, C)
    """
    w = w_ref[0]
    idx = idx_ref[0]
    tile, n = idx.shape[0], w.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    for k in range(knn_k):
        onehot = (col == idx[:, k][:, None]).astype(w.dtype)
        # exactly one 1.0 per row -> the matmul is an exact selection in
        # any float dtype (single-term sum; Mosaic requires a 32-bit acc)
        out_ref[0, k] = jax.lax.dot_general(
            onehot, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _scatter_kernel(g_ref, idx_ref, out_ref, *, knn_k: int):
    """out[0, j, :] += sum_{t, k : idx[t, k] == j} g[k, t, :].

    g_ref:   (1, K, TILE, C)
    idx_ref: (1, TILE, K)
    out_ref: (1, N, C)  — accumulated across the row-tile grid axis (tiles
             of one batch element run sequentially, so += is race-free)
    """
    idx = idx_ref[0]
    tile, n = idx.shape[0], out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # accumulate through VMEM each round: a (N, C) f32 register accumulator
    # live across the whole K loop spills; VMEM read-modify-write is cheap
    for k in range(knn_k):
        onehot = (col == idx[:, k][:, None]).astype(g_ref.dtype)
        out_ref[0] += jax.lax.dot_general(
            onehot, g_ref[0, k], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def gather_neighbors_kfirst(w, idx, interpret: bool = False):
    """(B, M, C) points + (B, R, K) indices → (B, K, R, C) gathered.

    ``out[b, k, i] = w[b, idx[b, i, k]]``.  Differentiable in ``w`` (the
    VJP is :func:`scatter_neighbors_kfirst` — one-hot matmuls both ways).
    """
    return _gather_cvjp(w, idx, w.shape[1], interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_cvjp(w, idx, m: int, interpret: bool):
    return _gather_pallas(w, idx, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_pallas(w, idx, interpret: bool = False):
    bsz, m, c = w.shape
    rows = idx.shape[1]
    knn_k = idx.shape[-1]
    tile = _tile_for(rows)
    grid = (bsz, rows // tile)
    return pl.pallas_call(
        functools.partial(_gather_kernel, knn_k=knn_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, knn_k, tile, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, knn_k, rows, c), w.dtype),
        interpret=interpret,
    )(w, idx)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _scatter_pallas(g, idx, m: int, interpret: bool = False):
    bsz, knn_k, rows, c = g.shape
    tile = _tile_for(rows)
    grid = (bsz, rows // tile)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, knn_k=knn_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, knn_k, tile, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, c), g.dtype),
        interpret=interpret,
    )(g, idx)


def _gather_fwd(w, idx, m, interpret):
    return _gather_pallas(w, idx, interpret), idx


def _gather_bwd(m, interpret, idx, g):
    # accumulate the scatter in f32 regardless of the activation dtype
    # (gather preserves dtype, so g.dtype == w.dtype)
    dw = _scatter_pallas(g.astype(jnp.float32), idx, m, interpret)
    return dw.astype(g.dtype), None


_gather_cvjp.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def scatter_neighbors_kfirst(g, idx, m: int, interpret: bool = False):
    """(B, K, R, C) per-pair values + (B, R, K) indices → (B, M, C) sums.

    ``out[b, j] = Σ_{i, k : idx[b, i, k] == j} g[b, k, i]`` — the transpose
    of :func:`gather_neighbors_kfirst` (whose VJP it is, and vice versa).
    """
    return _scatter_pallas(g, idx, m, interpret)


def _scatter_fwd(g, idx, m, interpret):
    return _scatter_pallas(g, idx, m, interpret), idx


def _scatter_bwd(m, interpret, idx, ct):
    return _gather_pallas(ct, idx, interpret).astype(ct.dtype), None




scatter_neighbors_kfirst.defvjp(_scatter_fwd, _scatter_bwd)


def gather_neighbors(w, idx, interpret: bool = False):
    """Drop-in for ``ops.index_points`` at (B, R, K) index shapes: returns
    (B, R, K, C).  The transpose out of K-first layout fuses into XLA
    consumers; the VJP scatters through the same one-hot matmuls instead of
    XLA's serial scatter-add."""
    return jnp.moveaxis(gather_neighbors_kfirst(w, idx, interpret), 1, 2)
