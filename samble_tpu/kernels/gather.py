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
    t = int(__import__('os').environ.get('SAMBLE_GATHER_TILE', 128))
    if t > 128 and n % t == 0:
        return t
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


def _sel_chunk(k0: int, ck: int, idx, n: int, dtype):
    """(CK·TILE, M) k-major one-hot selection block: row ``k·TILE + t`` has
    its single 1 at column ``idx[t, k0 + k]``.  Exactly one 1.0 per row →
    the matmul against it is an exact selection in any float dtype.

    Built as a 3-D iota compare + leading-dim collapse; Mosaic rejects the
    1-D flatten of a transposed index vector (``tpu.reshape (16x128) →
    (2048x1)`` fails infer-vector-layout)."""
    tile = idx.shape[0]
    idx_t = jnp.transpose(idx[:, k0:k0 + ck])  # (CK, TILE)
    col = jax.lax.broadcasted_iota(jnp.int32, (ck, tile, n), 2)
    sel = col == idx_t[:, :, None]  # (CK, TILE, M)
    return sel.reshape(ck * tile, n).astype(dtype)


def _chunk_of(knn_k: int, tile: int, m: int) -> int:
    """Selection-chunk width: bound the (CK·TILE, M) one-hot block to ~2M
    elements (4 MB bf16) so the intermediate stays inside the scoped-VMEM
    stack at every M, while each matmul is still big enough to fill the
    MXU (32 tiny K-loop matmuls measured ~2x slower than 2-4 chunked ones
    at B=64, N=1024, K=32; an unbounded chunk OOMed the 16M scoped-vmem
    stack at M=4096)."""
    ck = max(1, min(2048 // tile, 2_000_000 // max(tile * m, 1)))
    while knn_k % ck:
        ck -= 1
    return max(ck, 1)


def _gather_kernel(w_ref, idx_ref, out_ref, *, knn_k: int):
    """out[0, k, t, :] = w[idx[t, k], :] for one (batch, row-tile) cell.

    w_ref:   (1, M, C)     full reference point set
    idx_ref: (1, TILE, K)  neighbor indices (< M) of the tile rows
    out_ref: (1, K, TILE, C)
    """
    w = w_ref[0]
    idx = idx_ref[0]
    tile, n = idx.shape[0], w.shape[0]
    ck = _chunk_of(knn_k, tile, n)
    c = w.shape[-1]
    for k0 in range(0, knn_k, ck):
        sel = _sel_chunk(k0, ck, idx, n, w.dtype)
        out = jax.lax.dot_general(
            sel, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,  # Mosaic needs 32-bit acc
        ).astype(out_ref.dtype)
        out_ref[0, k0:k0 + ck] = out.reshape(ck, tile, c)


def _scatter_kernel(g_ref, idx_ref, out_ref, *, knn_k: int):
    """out[0, j, :] += sum_{t, k : idx[t, k] == j} g[k, t, :].

    g_ref:   (1, K, TILE, C)
    idx_ref: (1, TILE, K)
    out_ref: (1, M, C)  — accumulated across the row-tile grid axis (tiles
             of one batch element run sequentially, so += is race-free)
    """
    idx = idx_ref[0]
    tile, n = idx.shape[0], out_ref.shape[1]
    ck = _chunk_of(knn_k, tile, n)
    c = g_ref.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    for k0 in range(0, knn_k, ck):
        sel = _sel_chunk(k0, ck, idx, n, g_ref.dtype)
        g = g_ref[0, k0:k0 + ck].reshape(ck * tile, c)
        out_ref[0] += jax.lax.dot_general(
            sel, g, (((0,), (0,)), ((), ())),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w, idx)


@functools.partial(jax.jit, static_argnames=("m", "interpret", "acc_dtype"))
def _scatter_pallas(g, idx, m: int, interpret: bool = False, acc_dtype=None):
    """One-hot-transpose scatter-add.  ``acc_dtype`` sets the accumulator
    (= output) dtype independently of ``g``: the VJPs below keep ``g`` in
    bf16 so the selection matmuls run at full bf16 MXU rate (an upcast of a
    bf16 cotangent adds no information but drags the matmul onto the ~4x
    slower f32 MXU path) while accumulating across K-chunks and row tiles
    in f32."""
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
        out_shape=jax.ShapeDtypeStruct((bsz, m, c), acc_dtype or g.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(g, idx)


def _gather_fwd(w, idx, m, interpret):
    return _gather_pallas(w, idx, interpret), idx


def _gather_bwd(m, interpret, idx, g):
    # selection matmuls in the cotangent's own (usually bf16) dtype,
    # accumulation in f32 (see _scatter_pallas)
    dw = _scatter_pallas(g, idx, m, interpret, acc_dtype=jnp.float32)
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


def _gather_knn_kernel(xa_ref, xb_ref, w_ref, out_ref, idx_ref,
                       *, knn_k: int, idx_bits: int, m_valid: int):
    """kNN-fused gather cell: the extraction one-hot IS the gather one-hot.

    Per round, ``pool == kmin`` is the selected column's one-hot (packed
    keys are unique, kernels/keys.py) — one matmul gathers that neighbor's
    features, and the key's low bits are the neighbor index (emitted for
    the backward scatter).  This folds the standalone kNN pass (~10 ms at
    B=64, N=1024) into the gather.

    xa_ref: (1, TILE, CX)  normalized kNN features, tile rows
    xb_ref: (1, M, CX)     normalized kNN features, all rows
    w_ref:  (1, M, C)      features to gather
    out_ref: (1, K, TILE, C);  idx_ref: (1, TILE, K)
    """
    from samble_tpu.kernels import keys as keys_mod

    w = w_ref[0]
    tile = xa_ref.shape[1]
    low_mask = (1 << idx_bits) - 1

    pool0 = keys_mod.packed_key_tile(xa_ref[0], xb_ref[0], idx_bits, m_valid)

    # partial unroll: overlaps each round's selection matmul with the next
    # round's pool passes.  Round 5 raised the budget from 16 KB to 64 KB of
    # row width (unroll 8 → 16 at the train shapes) once the raised
    # scoped-vmem limit let the deeper bodies compile — measured on the full
    # train steps: seg@2048 259.8 → 264.3, cls@1024 1179.6 → 1200.0
    # clouds/s (same-session A/Bs, docs/kernels.md round-5 memo)
    budget = max(1, (int(__import__('os').environ.get(
        'SAMBLE_GATHER_UNROLL_KB', 64)) * 1024) // w.shape[0])
    umax = int(__import__('os').environ.get('SAMBLE_GATHER_UNROLL_MAX', 32))
    unroll = next(u for u in (32, 16, 8, 4, 2, 1)
                  if u <= min(budget, umax) and knn_k % u == 0)

    slot = jax.lax.broadcasted_iota(jnp.int32, (tile, knn_k), 1)

    def round_(r, carry):
        pool, idx_acc = carry
        for i in range(unroll):
            k = r * unroll + i  # traced; stores use pl.ds
            kmin = jnp.min(pool, axis=1, keepdims=True)  # (TILE, 1)
            onehot = pool == kmin
            pool = jnp.where(onehot, keys_mod.INTMAX, pool)
            sel = jax.lax.dot_general(
                onehot.astype(w.dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
            out_ref[0, pl.ds(k, 1)] = sel[None]
            idx_acc = jnp.where(slot == k, kmin & low_mask, idx_acc)
        return pool, idx_acc

    _, idx_acc = jax.lax.fori_loop(
        0, knn_k // unroll, round_,
        (pool0, jnp.zeros((tile, knn_k), jnp.int32)),
    )
    idx_ref[0] = idx_acc


@functools.partial(jax.jit, static_argnames=("knn_k", "interpret"))
def _gather_knn_pallas(w, xn, knn_k: int, interpret: bool = False):
    from samble_tpu.kernels import keys as keys_mod

    bsz, n, c = w.shape
    cx = xn.shape[-1]
    xn = xn.astype(jnp.float32)
    tile = _tile_for(n)
    # keys.py contract: index width from the 128-padded column count
    idx_bits = keys_mod.packing_bits(((n + 127) // 128) * 128)
    grid = (bsz, n // tile)
    return pl.pallas_call(
        functools.partial(_gather_knn_kernel, knn_k=knn_k,
                          idx_bits=idx_bits, m_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cx), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cx), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, knn_k, tile, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, knn_k, n, c), w.dtype),
            jax.ShapeDtypeStruct((bsz, n, knn_k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, xn, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_knn_kfirst(w, xn, knn_k: int, interpret: bool = False):
    """Self-kNN selection fused into the K-first gather.

    :param w: (B, N, C) features to gather (differentiable)
    :param xn: (B, N, CX) pre-normalized kNN features
        (ops.neighbors.knn_normalized; gradient-stopped like all kNN
        graphs, reference indices are integers)
    :returns: ``(gathered (B, K, N, C), idx (B, N, K))`` — the same
        neighbor sets as ``knn_pallas(xn, xn, k)`` (bit-identical packed
        keys, kernels/keys.py)
    """
    return _gather_knn_pallas(w, xn, knn_k, interpret)


def _gather_knn_fwd(w, xn, knn_k, interpret):
    out, idx = _gather_knn_pallas(w, xn, knn_k, interpret)
    return (out, idx), (idx, w.shape[1])


def _gather_knn_bwd(knn_k, interpret, res, cts):
    idx, m = res
    g, _ = cts  # idx cotangent is zero (int output)
    dw = _scatter_pallas(g, idx, m, interpret, acc_dtype=jnp.float32)
    return dw.astype(g.dtype), None


gather_knn_kfirst.defvjp(_gather_knn_fwd, _gather_knn_bwd)


def gather_neighbors(w, idx, interpret: bool = False):
    """Drop-in for ``ops.index_points`` at (B, R, K) index shapes: returns
    (B, R, K, C).  The transpose out of K-first layout fuses into XLA
    consumers; the VJP scatters through the same one-hot matmuls instead of
    XLA's serial scatter-add."""
    return jnp.moveaxis(gather_neighbors_kfirst(w, idx, interpret), 1, 2)


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# pallas_call has no GSPMD rule — unwrapped, a >1-device mesh would
# all-gather every operand and run the kernel replicated on each device.
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

gather_neighbors_kfirst = _spmd.data_parallel(gather_neighbors_kfirst, 2)
scatter_neighbors_kfirst = _spmd.data_parallel(scatter_neighbors_kfirst, 2)
gather_knn_kfirst = _spmd.data_parallel(gather_knn_kfirst, 2)
