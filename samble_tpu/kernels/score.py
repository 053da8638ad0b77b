"""Fused SAMBLE attention-score kernel.

The reference computes the downsampler's point score by materializing the
full (B, H, N, N+nb) softmax attention map, a dense (B, N, N) kNN mask, and
their product, then column-reducing (models/downsample.py:300-344 via
utils/ops.py:125-133).  At N=2048 that is three N² tensors round-tripping
HBM per downsample layer.

This kernel streams row tiles of the energy matrix: QKᵀ on the MXU →
in-tile softmax (denominator includes the bin-token columns) → the kNN mask
row is rebuilt on the fly from the (N, K) neighbor indices by lane
comparison → masked and unmasked column sums accumulate into (N,) outputs
across the sequential row-tile grid.  Nothing O(N²) ever leaves VMEM.

Covers idx modes col_sum / sparse_col_sum / sparse_col_avg /
sparse_col_sqr (the shipped configs use sparse_col_sqr,
configs/cls.yaml:156-158).  Row-statistic modes fall back to the XLA path.

Energy variants (``energy_asm``): 'dot' (q·k), 'l2' (−‖q−k‖²) and 'l2+'
(+‖q−k‖²).  Softmax rows are invariant to per-row constants, so the l2
energies reduce to a coefficient on the q·kᵀ matmul plus a per-COLUMN
bias s·‖k_j‖² computed in-kernel from the resident key block — the dense
(B, N, N+nb) l2 map of the reference (utils/ops.py:115-122 feeding
models/downsample.py:153-192) never exists.
Forward-only: scores are consumed under stop_gradient (see
samble_tpu/nn/downsample.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samble_tpu.kernels import keys as keys_mod


_ENERGY_ASM = {"dot": (1.0, 0.0), "l2": (2.0, -1.0), "l2+": (-2.0, 1.0)}


def _score_kernel(
    q_ref, k_ref, idx_ref, colsum_m_ref, colsum_f_ref, colcnt_ref,
    *, scale: float, n_valid: int, rows_valid: int, knn_k: int,
    energy_asm: str = "dot",
):
    """One (batch, row-tile) grid cell; row tiles accumulate sequentially.

    q_ref:       (1, TILE, D)   query rows
    k_ref:       (1, NT, D)     keys incl. bin-token columns (NT = N + nb)
    idx_ref:     (1, TILE, K)   kNN indices of the tile's rows
    colsum_m_ref:(1, 1, NT)     Σ_i attn·mask   (masked column sums)
    colsum_f_ref:(1, 1, NT)     Σ_i attn        (full column sums)
    colcnt_ref:  (1, 1, NT)     Σ_i mask        (column degrees)
    """
    j = pl.program_id(1)

    q = q_ref[0]  # (TILE, D)
    k = k_ref[0]  # (NT, D)
    tile, nt = q.shape[0], k.shape[0]

    coef, sgn = _ENERGY_ASM[energy_asm]
    energy = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, NT)
    if sgn != 0.0:  # l2 energies: per-column bias from the resident keys
        kb = sgn * jnp.sum(k.astype(jnp.float32) ** 2, axis=1)  # (NT,)
        energy = coef * energy + kb[None, :]
    energy = energy * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, nt), 1)
    # padded key rows (beyond the real N + nb) must not join the softmax
    energy = jnp.where(col < n_valid, energy, -jnp.inf)

    row_max = jnp.max(energy, axis=1, keepdims=True)
    ex = jnp.exp(energy - row_max)
    attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (TILE, NT)
    # zero out padded query rows so they don't pollute the column sums
    row_id = j * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, nt), 0)
    attn = jnp.where(row_id < rows_valid, attn, 0.0)

    # rebuild this tile's kNN mask rows from the index list: K lane compares
    # (Python-unrolled — Mosaic cannot dynamic_slice register arrays)
    idx = idx_ref[0]  # (TILE, K) int32
    mask = jnp.zeros((tile, nt), jnp.float32)
    for kk in range(knn_k):
        mask = mask + (col == idx[:, kk][:, None]).astype(jnp.float32)
    # kNN indices are unique per row, so mask entries are exactly 0/1

    part_m = jnp.sum(attn * mask, axis=0, keepdims=True)  # (1, NT)
    part_f = jnp.sum(attn, axis=0, keepdims=True)
    part_c = jnp.sum(mask, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        colsum_m_ref[0] = jnp.zeros((1, nt), jnp.float32)
        colsum_f_ref[0] = jnp.zeros((1, nt), jnp.float32)
        colcnt_ref[0] = jnp.zeros((1, nt), jnp.float32)

    colsum_m_ref[0] += part_m
    colsum_f_ref[0] += part_f
    colcnt_ref[0] += part_c


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                              "energy_asm"))
def sparse_attention_score_pallas(
    q: jax.Array,
    k: jax.Array,
    nb_idx: jax.Array,
    scale: float,
    interpret: bool = False,
    energy_asm: str = "dot",
):
    """Masked/unmasked column sums of softmax(q·kᵀ·scale) without HBM maps.

    :param q: (B, N, D) queries (points only)
    :param k: (B, NT, D) keys — N point columns then bin-token columns
    :param nb_idx: (B, N, K) kNN indices (columns < N)
    :param scale: softmax scale (1/√D)
    :returns: ``(colsum_masked (B, N), colsum_full (B, N), colcnt (B, N))``
        — reductions over the point columns only (token columns dropped).
    """
    bsz, n, d = q.shape
    nt = k.shape[1]
    knn_k = nb_idx.shape[-1]
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)

    tile = 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)
    n_pad = _round_up(n, tile)
    nt_pad = _round_up(nt, 128)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        # padded query rows attend somewhere harmless (col 0) and are
        # dropped on the host side; their mask rows point at column 0 too,
        # slightly inflating col 0's stats — so pad the *index* rows with
        # an out-of-range column that the mask compare never hits.
        nb_idx = jnp.pad(
            nb_idx, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=nt_pad + 1
        )
    if nt_pad != nt:
        k = jnp.pad(k, ((0, 0), (0, nt_pad - nt), (0, 0)))

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _score_kernel, scale=scale, n_valid=nt, rows_valid=n, knn_k=knn_k,
        energy_asm=energy_asm,
    )
    colsum_m, colsum_f, colcnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nt_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nt_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nt_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, nt_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, nt_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, nt_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, nb_idx)
    # only point columns carry scores (token columns are key-side only)
    return colsum_m[:, 0, :n], colsum_f[:, 0, :n], colcnt[:, 0, :n]


def _score_fused_kernel(
    xa_ref, xb_ref, q_ref, k_ref, colsum_m_ref, colsum_f_ref, colcnt_ref,
    *, scale: float, n_valid: int, rows_valid: int, knn_k: int,
    idx_bits: int, nk_pad: int, fast_sel: bool, bisect_rounds: int = 16,
    energy_bf16: bool = False, energy_asm: str = "dot",
):
    """kNN-fused variant of _score_kernel: the adjacency row is derived from
    recomputed packed distance keys (kernels/keys.py) and a per-row K-th-key
    threshold — no index list, no separate kNN kernel, no K-compare rebuild.

    xa_ref: (1, TILE, C)    normalized kNN features, tile rows
    xb_ref: (1, NKPAD, C)   normalized kNN features, all rows (point rows only)
    q_ref:  (1, TILE, D); k_ref: (1, NT, D) keys incl. bin-token columns
    """
    j = pl.program_id(1)

    q = q_ref[0]
    k = k_ref[0]
    tile, nt = q.shape[0], k.shape[0]

    if energy_bf16:
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
    coef, sgn = _ENERGY_ASM[energy_asm]
    energy = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, NT)
    if sgn != 0.0:  # l2 energies: per-column bias from the resident keys
        kb = sgn * jnp.sum(k.astype(jnp.float32) ** 2, axis=1)  # (NT,)
        energy = coef * energy + kb[None, :]
    energy = energy * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, nt), 1)
    energy = jnp.where(col < n_valid, energy, -jnp.inf)

    row_max = jnp.max(energy, axis=1, keepdims=True)
    ex = jnp.exp(energy - row_max)
    attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (TILE, NT)
    row_id = j * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, nt), 0)
    attn = jnp.where(row_id < rows_valid, attn, 0.0)

    # adjacency from packed keys: one matmul + one compare, K-exact
    key = keys_mod.packed_key_tile(
        xa_ref[0], xb_ref[0], idx_bits, rows_valid
    )  # (TILE, NKPAD) — point columns only
    kth = (keys_mod.kth_smallest_key_fast(key, knn_k, bisect_rounds)
           if fast_sel else keys_mod.kth_smallest_key(key, knn_k))
    # mask-width row-validity iota built directly (lane-slicing a wider
    # iota trips a Mosaic strided-slice bug on this toolchain)
    row_id_k = j * tile + jax.lax.broadcasted_iota(
        jnp.int32, (tile, nk_pad), 0
    )
    maskp = ((key <= kth) & (row_id_k < rows_valid)).astype(jnp.float32)
    if nt > nk_pad:
        mask = jnp.concatenate(
            [maskp, jnp.zeros((tile, nt - nk_pad), jnp.float32)], axis=1
        )
    else:
        mask = maskp[:, :nt]

    part_m = jnp.sum(attn * mask, axis=0, keepdims=True)  # (1, NT)
    part_f = jnp.sum(attn, axis=0, keepdims=True)
    part_c = jnp.sum(mask, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        colsum_m_ref[0] = jnp.zeros((1, nt), jnp.float32)
        colsum_f_ref[0] = jnp.zeros((1, nt), jnp.float32)
        colcnt_ref[0] = jnp.zeros((1, nt), jnp.float32)

    colsum_m_ref[0] += part_m
    colsum_f_ref[0] += part_f
    colcnt_ref[0] += part_c


@functools.partial(jax.jit, static_argnames=("knn_k", "scale", "interpret",
                                              "fast_sel", "bisect_rounds",
                                              "row_tile", "energy_bf16",
                                              "energy_asm"))
def sparse_attention_score_fused(
    q: jax.Array,
    k: jax.Array,
    xn: jax.Array,
    knn_k: int,
    scale: float,
    interpret: bool = False,
    fast_sel: bool = True,
    bisect_rounds: int = 16,
    row_tile: int = 256,
    energy_bf16: bool = False,
    energy_asm: str = "dot",
):
    """kNN-fused masked/unmasked column sums — no separate kNN kernel.

    Same contract as :func:`sparse_attention_score_pallas`, but the kNN
    adjacency is computed in-kernel from ``xn`` (the pre-normalized kNN
    features, ops.neighbors.knn_normalized) instead of an index list.

    :param q: (B, N, D) queries (points only)
    :param k: (B, NT, D) keys — N point columns then bin-token columns
    :param xn: (B, N, C) pre-normalized features the kNN graph is built from
    :returns: ``(colsum_masked (B, N), colsum_full (B, N), colcnt (B, N))``
    """
    bsz, n, d = q.shape
    nt = k.shape[1]
    c = xn.shape[-1]
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    xn = xn.astype(jnp.float32)

    # larger row tiles amortize per-grid-cell overhead (measured: the
    # 16-round bisection is only ~4 ms of the 16.4 ms kernel at bs=256,
    # N=1024 with 128-row tiles — see docs/kernels.md round-4 memo)
    tile = next((t for t in (row_tile, 256, 128, 64) if t <= n and n % t == 0),
                n)
    n_pad = _round_up(n, tile)
    nt_pad = _round_up(nt, 128)
    nk_pad = min(_round_up(n, 128), nt_pad)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        xn_rows = jnp.pad(xn, pad)
    else:
        xn_rows = xn
    if nk_pad != n:
        xn_cols = jnp.pad(xn, ((0, 0), (0, nk_pad - n), (0, 0)))
    else:
        xn_cols = xn
    if nt_pad != nt:
        k = jnp.pad(k, ((0, 0), (0, nt_pad - nt), (0, 0)))
    idx_bits = keys_mod.packing_bits(nk_pad)

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _score_fused_kernel, scale=scale, n_valid=nt, rows_valid=n,
        knn_k=knn_k, idx_bits=idx_bits, nk_pad=nk_pad, fast_sel=fast_sel,
        bisect_rounds=bisect_rounds, energy_bf16=energy_bf16,
        energy_asm=energy_asm,
    )
    colsum_m, colsum_f, colcnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, nt_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nt_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nt_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, nt_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, nt_pad), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, nt_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn_rows, xn_cols, q, k)
    return colsum_m[:, 0, :n], colsum_f[:, 0, :n], colcnt[:, 0, :n]


def score_from_colsums(colsum_m, colsum_f, colcnt, idx_mode: str):
    """Combine kernel outputs into the per-point score (XLA, trivial).

    Matches models/downsample.py:309-344 for the column modes.
    """
    deg = colcnt + 1e-8
    if idx_mode == "col_sum":
        score = colsum_f
    elif idx_mode == "sparse_col_sum":
        score = colsum_m
    elif idx_mode == "sparse_col_avg":
        score = colsum_m / deg
    elif idx_mode == "sparse_col_sqr":
        score = colsum_m / deg / deg
    elif idx_mode == "sparse_col_sum_sqr":
        score = 0.5 * colsum_m / deg / deg + 0.5 * colsum_m
    else:
        raise ValueError(f"idx_mode {idx_mode} not covered by the fused kernel")
    return jnp.nan_to_num(score, nan=0.0, posinf=0.0, neginf=0.0)


FUSED_IDX_MODES = (
    "col_sum", "sparse_col_sum", "sparse_col_avg", "sparse_col_sqr",
    "sparse_col_sum_sqr",
)


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# pallas_call has no GSPMD rule — unwrapped, a >1-device mesh would
# all-gather every operand and run the kernel replicated on each device.
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

sparse_attention_score_pallas = _spmd.data_parallel(sparse_attention_score_pallas, 3)
sparse_attention_score_fused = _spmd.data_parallel(sparse_attention_score_fused, 3)
