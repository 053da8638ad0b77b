"""Fused EdgeConv (DGCNN edge convolution) inference kernel.

The EdgeConv layer (reference models/embedding.py:7-39) builds a
(B, N, K, C1) grouped tensor, runs BN→LeakyReLU→Conv→BN→LeakyReLU on every
(point, neighbor) pair and max-pools over K.  Even with the conv1 matmul
hoisted before the gather, the grouped tensor costs ~63 ms/layer at
B=128, N=1024, K=32, C=64 on a v5e (gather + three elementwise passes over
~1 GB).

Eval-mode structure: conv1 is linear and BatchNorm is a per-channel
affine, so the pre-activation is a rank-1 sum z_ij = u'_i + w'_j of two
per-point vectors, and the whole layer is

    out_i = max_{j∈nb(i)} leaky( W2'ᵀ · leaky(u'_i + w'_j) + b2' )

This kernel keeps w' for the whole cloud in VMEM and realizes the
neighbor selection as K one-hot MXU matmuls (the Mosaic gather idiom) —
the (B, N, K, C) tensor never exists.  Forward/eval only: training takes
the gather path (BN needs real batch statistics there anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samble_tpu.kernels import keys as keys_mod


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _edgeconv_kernel(u_ref, w_ref, idx_ref, w2_ref, b2_ref, out_ref,
                     *, knn_k: int, alpha: float):
    """One (batch, row-tile) grid cell.

    u_ref:   (1, TILE, C1)  per-point center term, BN1 affine applied
    w_ref:   (1, NPAD, C1)  per-point neighbor term, BN1 scale applied
    idx_ref: (1, TILE, K)   kNN indices (padded rows → 0)
    w2_ref:  (C1, C2)       conv2 kernel with BN2 affine folded in
    b2_ref:  (1, C2)        folded conv2 bias
    out_ref: (1, TILE, C2)
    """
    u = u_ref[0]
    w = w_ref[0]
    idx = idx_ref[0]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    tile, npad = u.shape[0], w.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, npad), 1)
    acc = jnp.full((tile, w2.shape[1]), -jnp.inf, jnp.float32)
    for kk in range(knn_k):
        onehot = (col == idx[:, kk][:, None]).astype(w.dtype)
        w_sel = jax.lax.dot_general(
            onehot, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, C1)
        z = _leaky(u.astype(jnp.float32) + w_sel, alpha)
        h = jax.lax.dot_general(
            z.astype(w2.dtype), w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2.astype(jnp.float32)
        acc = jnp.maximum(acc, _leaky(h, alpha))
    out_ref[0] = acc.astype(out_ref.dtype)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _tile_for(n: int) -> int:
    """Row-tile width: 128 when it divides N, else 64, else N itself — the
    chosen tile always divides N, so the wrappers never row-pad (256-row
    tiles A/B'd at N=4096 in round 5: u8/t256 224.8 vs u16/t128 226.6
    clouds/s — the wider tile lost to the deeper unroll).  Packed-key index
    width still follows keys.py's contract
    (``packing_bits(round_up(N, 128))``) for bit-identity with knn_pallas."""
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def edgeconv_pallas(u, w, idx, w2, b2, alpha: float = 0.2,
                    interpret: bool = False):
    """Fused eval-mode EdgeConv.

    :param u: (B, N, C1) center term (BN1 affine already applied)
    :param w: (B, N, C1) neighbor term (BN1 scale already applied)
    :param idx: (B, N, K) int32 kNN indices
    :param w2: (C1, C2) folded conv2 weight;  b2: (C2,) folded bias
    :returns: (B, N, C2)
    """
    bsz, n, c1 = u.shape
    c2 = w2.shape[1]
    knn_k = idx.shape[-1]
    tile = _tile_for(n)  # always divides n — no row padding needed
    n_pad = n
    b2 = b2.reshape(1, c2)

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(_edgeconv_kernel, knn_k=knn_k, alpha=alpha)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c2), u.dtype),
        compiler_params=pltpu.CompilerParams(
            # the selection pool + unrolled one-hots exceed the 16 MB
            # default scoped-vmem stack at N=4096 (measured 17.53 MB)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u, w, idx, w2, b2)
    return out[:, :n]


def _edgeconv_knn_kernel(xa_ref, xb_ref, u_ref, w_ref, w2_ref, b2_ref,
                         out_ref, *, knn_k: int, alpha: float,
                         idx_bits: int, m_valid: int):
    """kNN-fused EdgeConv cell: selection and convolution share one loop.

    The split pipeline runs the kNN kernel (min-extract per round: ~3 VPU
    passes) and then the EdgeConv kernel re-derives each neighbor's one-hot
    from the stored index (another full-width compare per round).  But the
    extraction's ``pool == kmin`` compare IS the one-hot — so doing both in
    one loop costs 3 passes/round instead of ~5, and the (B, N, K) index
    tensor never exists.

    xa_ref: (1, TILE, CX)  normalized kNN features, tile rows
    xb_ref: (1, NPAD, CX)  normalized kNN features, all rows
    u/w/w2/b2/out as in _edgeconv_kernel.
    """
    u = u_ref[0]
    w = w_ref[0]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    tile = u.shape[0]

    pool0 = keys_mod.packed_key_tile(xa_ref[0], xb_ref[0], idx_bits, m_valid)
    acc0 = jnp.full((tile, w2.shape[1]), -jnp.inf, jnp.float32)
    u_f = u.astype(jnp.float32)

    # Partially-unrolled extraction: the unrolled rounds let Mosaic overlap
    # each round's selection/chain matmuls with the next round's VPU passes,
    # while a fully-rolled fori_loop serializes them (measured 29 ms vs
    # ~16 ms at B=128, N=1024).  The round-3 budget (16 KB of row width,
    # i.e. unroll 4 at N=4096) was set when deeper unrolls blew Mosaic's
    # compile-time resources; with the 64 MB scoped-vmem limit below the
    # 16-wide body now compiles at every shipped width and is the measured
    # optimum (round-5 A/B at N=4096, bs=32: unroll 4 → 210.6, 8 → 220.2,
    # 16 → 226.6 clouds/s whole-step).
    budget = max(1, (int(__import__('os').environ.get('SAMBLE_EC_UNROLL_KB', 128)) * 1024) // w.shape[0])
    umax = int(__import__('os').environ.get('SAMBLE_EC_UNROLL_MAX', 32))
    unroll = next(u for u in (32, 16, 8, 4, 2, 1)
                  if u <= min(budget, umax) and knn_k % u == 0)

    def round_(_, carry):
        pool, acc = carry
        for _ in range(unroll):
            kmin = jnp.min(pool, axis=1, keepdims=True)
            onehot = pool == kmin  # keys unique → exactly one col per row
            pool = jnp.where(onehot, keys_mod.INTMAX, pool)
            w_sel = jax.lax.dot_general(
                onehot.astype(w.dtype), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE, C1)
            z = _leaky(u_f + w_sel, alpha)
            h = jax.lax.dot_general(
                z.astype(w2.dtype), w2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2.astype(jnp.float32)
            acc = jnp.maximum(acc, _leaky(h, alpha))
        return pool, acc

    _, acc = jax.lax.fori_loop(0, knn_k // unroll, round_, (pool0, acc0))
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("knn_k", "alpha", "interpret"))
def edgeconv_knn_pallas(u, w, xn, knn_k: int, w2, b2, alpha: float = 0.2,
                        interpret: bool = False):
    """Fused eval-mode EdgeConv with in-kernel kNN selection.

    Same contract as :func:`edgeconv_pallas` but takes the pre-normalized
    kNN features ``xn`` (ops.neighbors.knn_normalized) instead of an index
    tensor; the neighbor sets are identical to ``knn_pallas(xn, xn, k)``
    (bit-identical packed keys, kernels/keys.py).

    :param u: (B, N, C1) center term;  w: (B, N, C1) neighbor term
    :param xn: (B, N, CX) normalized features the kNN graph is built from
    :param w2: (C1, C2) folded conv2 weight;  b2: (C2,) folded bias
    :returns: (B, N, C2)
    """
    bsz, n, c1 = u.shape
    cx = xn.shape[-1]
    c2 = w2.shape[1]
    xn = xn.astype(jnp.float32)
    tile = _tile_for(n)  # always divides n — no row padding needed
    n_pad = n
    idx_bits = keys_mod.packing_bits(_round_up(n, 128))
    b2 = b2.reshape(1, c2)

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _edgeconv_knn_kernel, knn_k=knn_k, alpha=alpha,
        idx_bits=idx_bits, m_valid=n,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cx), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, cx), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c2), u.dtype),
        compiler_params=pltpu.CompilerParams(
            # the selection pool + unrolled one-hots exceed the 16 MB
            # default scoped-vmem stack at N=4096 (measured 17.53 MB)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, xn, u, w, w2, b2)
    return out[:, :n]


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# pallas_call has no GSPMD rule — unwrapped, a >1-device mesh would
# all-gather every operand and run the kernel replicated on each device.
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

edgeconv_pallas = _spmd.data_parallel(edgeconv_pallas, 3)
edgeconv_knn_pallas = _spmd.data_parallel(edgeconv_knn_pallas, 3)
