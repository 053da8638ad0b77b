"""Fused Neighbor2Point local-attention kernel.

The N2P layer (models/attention.py:130-250 in the reference) attends each
point to its K kNN neighbors.  The reference gathers (B, N, K, C) neighbor
tensors; even the project-then-gather rewrite costs ~180 ms/layer at
B=128, N=1024, C=128, K=32 on a v5e — the row gathers dominate the model.
The dense-masked XLA rewrite (nn/attention.py) gets to ~52 ms but still
materializes the (B, H, N, N) energy and a (B, N, N) mask in HBM.

This kernel streams row tiles and keeps everything in VMEM:

  MXU:  E_h = q_tile_h · k_hᵀ            (TILE, N) per head
  VPU:  neighbor mask rebuilt from the (TILE, K) kNN indices by K lane
        compares (same trick as kernels/score.py), masked softmax
  MXU:  out_h = softmax(E_h) · v_h       (TILE, D)

Nothing O(N²) touches HBM.  scalar_dot group-type algebra (see
Neighbor2PointAttention._use_dense): 'diff' ≡ plain masked attention minus
v_i; 'dot-sub' ≡ negated energies.

Differentiable via jax.custom_vjp with a fused flash-style Pallas backward
(``_n2p_bwd_kernel`` below): the residual is just (q, k, v, idx) and the
backward streams the same row tiles, recomputing the masked softmax in
VMEM and accumulating dq/dk/dv without materializing the (B, H, N, N)
energy — training and serving both take the fused cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samble_tpu.kernels import keys as keys_mod


def _n2p_kernel(
    q_ref, k_ref, v_ref, v_tile_ref, idx_ref, out_ref,
    *, heads: int, scale: float, knn_k: int, negate: bool, subtract_v: bool,
    tile: int,
):
    """One (batch, row-tile) grid cell.

    q_ref:      (1, TILE, HDq)  query rows
    k_ref:      (1, NPAD, HDk)  all keys
    v_ref:      (1, NPAD, HDv)  all values
    v_tile_ref: (1, TILE, HDv)  the tile's own value rows (for 'diff')
    idx_ref:    (1, TILE, K)    kNN indices of the tile's rows (pad rows → 0)
    out_ref:    (1, TILE, HDv)
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    idx = idx_ref[0]
    npad = k.shape[0]
    dq = q.shape[1] // heads
    dv = v.shape[1] // heads

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, npad), 1)
    mask = jnp.zeros((tile, npad), jnp.bool_)
    for kk in range(knn_k):
        mask = mask | (col == idx[:, kk][:, None])

    for h in range(heads):
        qh = q[:, h * dq:(h + 1) * dq]
        kh = k[:, h * dq:(h + 1) * dq]
        vh = v[:, h * dv:(h + 1) * dv]
        e = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, NPAD)
        e = e * (-scale if negate else scale)
        e = jnp.where(mask, e, -jnp.inf)
        m = jnp.max(e, axis=1, keepdims=True)
        ex = jnp.exp(e - m)
        attn = ex / jnp.sum(ex, axis=1, keepdims=True)
        oh = jax.lax.dot_general(
            attn.astype(v.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, DV)
        if subtract_v:
            oh = oh - v_tile_ref[0, :, h * dv:(h + 1) * dv].astype(jnp.float32)
        out_ref[0, :, h * dv:(h + 1) * dv] = oh.astype(out_ref.dtype)


def _tile_for(n: int) -> int:
    """Row-tile width: 128 when it divides N, else 64, else N itself.

    The chosen tile always divides N, so the wrappers never row-pad; the
    packed-key index width still uses ``packing_bits(round_up(N, 128))`` to
    honor keys.py's contract (bit-identity with the split knn_pallas, which
    pads its reference set to a multiple of 128)."""
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "negate", "subtract_v",
                              "interpret")
)
def _n2p_pallas_fwd(q, k, v, idx, heads, scale, negate, subtract_v,
                    interpret=False):
    bsz, n, hdq = q.shape
    hdv = v.shape[-1]
    knn_k = idx.shape[-1]
    tile = _tile_for(n)  # always divides n — no row padding needed
    n_pad = n

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _n2p_kernel, heads=heads, scale=scale, knn_k=knn_k,
        negate=negate, subtract_v=subtract_v, tile=tile,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, hdq), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hdq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hdv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, hdv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, hdv), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, hdv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # the fused bwd's per-cell live set exceeds the 16 MB default
            # scoped-vmem stack at N=4096 (21.7 MB measured — the
            # train_step_cls_4096 bench row compile failure, round 5)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, v, idx)
    return out[:, :n]


def _n2p_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, idx_ref, dq_ref, dk_ref, dv_ref,
    *, heads: int, scale: float, knn_k: int, negate: bool, subtract_v: bool,
    tile: int,
):
    """Backward of the masked local attention, one (batch, row-tile) cell.

    Row tiles of one batch run sequentially, accumulating dk/dv (full-N
    outputs) across the grid like kernels/score.py's column sums:

      A  = softmax(±scale · q kᵀ, neighbor-masked)      (recomputed)
      dv += Aᵀ g   [− g at own rows if subtract_v]
      dA = g vᵀ;   dE = A ⊙ (dA − rowsum(dA ⊙ A))
      dq = ±scale · dE k;   dk += ±scale · dEᵀ q_tile
    """
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    idx = idx_ref[0]
    npad = k.shape[0]
    dq = q.shape[1] // heads
    dv = v.shape[1] // heads
    sgn = -scale if negate else scale

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, npad), 1)
    mask = jnp.zeros((tile, npad), jnp.bool_)
    for kk in range(knn_k):
        mask = mask | (col == idx[:, kk][:, None])

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for h in range(heads):
        qh = q[:, h * dq:(h + 1) * dq].astype(jnp.float32)
        kh = k[:, h * dq:(h + 1) * dq].astype(jnp.float32)
        vh = v[:, h * dv:(h + 1) * dv].astype(jnp.float32)
        gh = g[:, h * dv:(h + 1) * dv].astype(jnp.float32)
        e = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sgn
        e = jnp.where(mask, e, -jnp.inf)
        m = jnp.max(e, axis=1, keepdims=True)
        ex = jnp.exp(e - m)
        attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (TILE, NPAD)

        da = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, NPAD)
        r = jnp.sum(da * attn, axis=1, keepdims=True)
        de = attn * (da - r)  # (TILE, NPAD)

        dq_ref[0, :, h * dq:(h + 1) * dq] = (
            jax.lax.dot_general(
                de, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sgn
        ).astype(dq_ref.dtype)
        dk_ref[0, :, h * dq:(h + 1) * dq] += (
            jax.lax.dot_general(
                de, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sgn
        ).astype(dk_ref.dtype)
        dv_acc = jax.lax.dot_general(
            attn, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NPAD, DV)
        dv_ref[0, :, h * dv:(h + 1) * dv] += dv_acc.astype(dv_ref.dtype)
        if subtract_v:
            dv_ref[0, pl.ds(j * tile, tile), h * dv:(h + 1) * dv] += (
                -gh
            ).astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "negate", "subtract_v",
                              "interpret")
)
def _n2p_pallas_bwd(q, k, v, idx, g, heads, scale, negate, subtract_v,
                    interpret=False):
    bsz, n, hdq = q.shape
    hdv = v.shape[-1]
    knn_k = idx.shape[-1]
    tile = _tile_for(n)  # always divides n — no row padding needed
    n_pad = n

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _n2p_bwd_kernel, heads=heads, scale=scale, knn_k=knn_k,
        negate=negate, subtract_v=subtract_v, tile=tile,
    )
    row_spec = lambda c: pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM)
    full_spec = lambda c: pl.BlockSpec((1, n_pad, c), lambda i, j: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(hdq), full_spec(hdq), full_spec(hdv), row_spec(hdv),
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(hdq), full_spec(hdq), full_spec(hdv)],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, hdq), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_pad, hdq), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_pad, hdv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the fused bwd's per-cell live set exceeds the 16 MB default
            # scoped-vmem stack at N=4096 (21.7 MB measured — the
            # train_step_cls_4096 bench row compile failure, round 5)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, g, idx)
    return dq[:, :n], dk[:, :n], dv[:, :n]


def n2p_dense_reference(q, k, v, idx, heads, scale, negate, subtract_v):
    """Dense-masked XLA formulation — same math, used for the backward pass
    and as the CPU/differential-test reference."""
    b, n, hdq = q.shape
    hdv = v.shape[-1]
    qh = q.reshape(b, n, heads, hdq // heads)
    kh = k.reshape(b, n, heads, hdq // heads)
    vh = v.reshape(b, n, heads, hdv // heads)
    energy = jnp.einsum("bnhd,bmhd->bhnm", qh, kh)
    if negate:
        energy = -energy
    # compare-reduce adjacency (2.6x faster than scatter on TPU, see
    # ops.neighbors.mask_from_idx)
    neighbor = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).any(axis=2)
    energy = jnp.where(
        neighbor[:, None], energy.astype(jnp.float32) * scale, -jnp.inf
    )
    attn = jax.nn.softmax(energy, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh)
    if subtract_v:
        out = out - vh
    return out.reshape(b, n, hdv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def n2p_attention(q, k, v, idx, heads, scale, negate, subtract_v):
    """Fused N2P local attention (Pallas forward, dense-XLA backward).

    :param q: (B, N, H·Dq);  k: (B, N, H·Dq);  v: (B, N, H·Dv)
    :param idx: (B, N, K) int32 kNN indices (no gradient)
    :returns: (B, N, H·Dv) — heads laid out contiguously, matching
        ``merge_heads(split_heads(...))``.
    """
    return _n2p_pallas_fwd(q, k, v, idx, heads, scale, negate, subtract_v)


def _n2p_fwd(q, k, v, idx, heads, scale, negate, subtract_v):
    out = _n2p_pallas_fwd(q, k, v, idx, heads, scale, negate, subtract_v)
    return out, (q, k, v, idx)


def _n2p_bwd(heads, scale, negate, subtract_v, residuals, g):
    q, k, v, idx = residuals
    try:
        from samble_tpu import kernels

        use_kernel = kernels.use_pallas()
    except Exception:
        use_kernel = False
    if use_kernel:
        dq, dk, dv = _n2p_pallas_bwd(
            q, k, v, idx, g, heads, scale, negate, subtract_v
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None
    _, vjp = jax.vjp(
        lambda q, k, v: n2p_dense_reference(
            q, k, v, idx, heads, scale, negate, subtract_v
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


n2p_attention.defvjp(_n2p_fwd, _n2p_bwd)


# ---------------------------------------------------------------------------
# Fully-fused variant: kNN selection lives INSIDE the attention kernel.
#
# The original pipeline runs the kNN kernel (pairwise keys + K-round
# extraction, ~3 VPU passes/round) and then REBUILDS the adjacency in this
# kernel from the index list with K more full-width compares — the mask
# rebuild alone is ~2/3 of the forward kernel's VPU work at K=32.  The
# packed-key formulation (kernels/keys.py) collapses this: the kernel
# recomputes the distance keys for its row tile (one MXU matmul + ~6 VPU
# passes), extracts the K-th smallest key per row, and the mask is ONE
# compare.  The separate kNN kernel, its HBM index round-trip, and the
# 2·K compare passes all disappear.  The K-th key is emitted as a tiny
# (B, N) residual so the backward kernel rebuilds the identical mask with
# one compare instead of re-extracting.
# ---------------------------------------------------------------------------


def _softmax_rows(e):
    """Row softmax that returns 0-rows (not NaN) for all-masked rows."""
    m = jnp.max(e, axis=1, keepdims=True)
    ex = jnp.exp(e - jnp.where(jnp.isfinite(m), m, 0.0))
    s = jnp.sum(ex, axis=1, keepdims=True)
    return ex / jnp.where(s == 0.0, 1.0, s)


def _n2p_fused_kernel(
    xa_ref, xb_ref, q_ref, k_ref, v_ref, v_tile_ref, out_ref, kth_ref,
    *, heads: int, scale: float, knn_k: int, negate: bool, subtract_v: bool,
    tile: int, idx_bits: int, m_valid: int, fast_sel: bool,
):
    """One (batch, row-tile) grid cell of the kNN-fused local attention.

    xa_ref: (1, TILE, C)  normalized kNN features, tile rows
    xb_ref: (1, NPAD, C)  normalized kNN features, all rows
    q/k/v as in _n2p_kernel; kth_ref: (1, TILE, 1) int32 selection threshold
    """
    key = keys_mod.packed_key_tile(xa_ref[0], xb_ref[0], idx_bits, m_valid)
    kth = (keys_mod.kth_smallest_key_fast(key, knn_k) if fast_sel
           else keys_mod.kth_smallest_key(key, knn_k))  # (TILE, 1)
    mask = key <= kth  # exactly the K nearest columns of each row
    kth_ref[0] = kth

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dq = q.shape[1] // heads
    dv = v.shape[1] // heads
    for h in range(heads):
        qh = q[:, h * dq:(h + 1) * dq]
        kh = k[:, h * dq:(h + 1) * dq]
        vh = v[:, h * dv:(h + 1) * dv]
        e = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = e * (-scale if negate else scale)
        attn = _softmax_rows(jnp.where(mask, e, -jnp.inf))
        oh = jax.lax.dot_general(
            attn.astype(v.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if subtract_v:
            oh = oh - v_tile_ref[0, :, h * dv:(h + 1) * dv].astype(jnp.float32)
        out_ref[0, :, h * dv:(h + 1) * dv] = oh.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "negate", "subtract_v",
                              "knn_k", "interpret", "fast_sel")
)
def _n2p_fused_pallas_fwd(q, k, v, xn, heads, scale, negate, subtract_v,
                          knn_k, interpret=False, fast_sel=True):
    bsz, n, hdq = q.shape
    hdv = v.shape[-1]
    c = xn.shape[-1]
    xn = xn.astype(jnp.float32)
    tile = _tile_for(n)  # always divides n — no row padding needed
    n_pad = n
    idx_bits = keys_mod.packing_bits(_round_up(n, 128))

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _n2p_fused_kernel, heads=heads, scale=scale, knn_k=knn_k,
        negate=negate, subtract_v=subtract_v, tile=tile,
        idx_bits=idx_bits, m_valid=n, fast_sel=fast_sel,
    )
    out, kth = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, hdq), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hdq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hdv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, hdv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, hdv), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, hdv), q.dtype),
            jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the fused bwd's per-cell live set exceeds the 16 MB default
            # scoped-vmem stack at N=4096 (21.7 MB measured — the
            # train_step_cls_4096 bench row compile failure, round 5)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, xn, q, k, v, v)
    return out[:, :n], kth[:, :n, 0]


def _n2p_fused_bwd_kernel(
    xa_ref, xb_ref, kth_ref, q_ref, k_ref, v_ref, g_ref,
    dq_ref, dk_ref, dv_ref,
    *, heads: int, scale: float, negate: bool, subtract_v: bool,
    tile: int, idx_bits: int, m_valid: int,
):
    """Backward of the fused local attention; mask from the saved threshold.

    Same math as _n2p_bwd_kernel, but the adjacency is ONE packed-key
    compare against kth_ref instead of K index compares.  Padded rows carry
    kth = INTMAX (all-true mask → finite softmax) and zero cotangent rows,
    so their contributions to dk/dv vanish.
    """
    j = pl.program_id(1)
    key = keys_mod.packed_key_tile(xa_ref[0], xb_ref[0], idx_bits, m_valid)
    mask = key <= kth_ref[0]

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    dq = q.shape[1] // heads
    dv = v.shape[1] // heads
    sgn = -scale if negate else scale

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for h in range(heads):
        qh = q[:, h * dq:(h + 1) * dq].astype(jnp.float32)
        kh = k[:, h * dq:(h + 1) * dq].astype(jnp.float32)
        vh = v[:, h * dv:(h + 1) * dv].astype(jnp.float32)
        gh = g[:, h * dv:(h + 1) * dv].astype(jnp.float32)
        e = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sgn
        attn = _softmax_rows(jnp.where(mask, e, -jnp.inf))

        da = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r = jnp.sum(da * attn, axis=1, keepdims=True)
        de = attn * (da - r)

        dq_ref[0, :, h * dq:(h + 1) * dq] = (
            jax.lax.dot_general(
                de, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sgn
        ).astype(dq_ref.dtype)
        dk_ref[0, :, h * dq:(h + 1) * dq] += (
            jax.lax.dot_general(
                de, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sgn
        ).astype(dk_ref.dtype)
        dv_acc = jax.lax.dot_general(
            attn, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_ref[0, :, h * dv:(h + 1) * dv] += dv_acc.astype(dv_ref.dtype)
        if subtract_v:
            dv_ref[0, pl.ds(j * tile, tile), h * dv:(h + 1) * dv] += (
                -gh
            ).astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "negate", "subtract_v",
                              "interpret")
)
def _n2p_fused_pallas_bwd(q, k, v, xn, kth, g, heads, scale, negate,
                          subtract_v, interpret=False):
    bsz, n, hdq = q.shape
    hdv = v.shape[-1]
    c = xn.shape[-1]
    xn = xn.astype(jnp.float32)
    tile = _tile_for(n)  # always divides n — no row padding needed
    n_pad = n
    idx_bits = keys_mod.packing_bits(_round_up(n, 128))
    kth = kth[..., None]  # (B, N, 1)

    grid = (bsz, n_pad // tile)
    kernel = functools.partial(
        _n2p_fused_bwd_kernel, heads=heads, scale=scale,
        negate=negate, subtract_v=subtract_v, tile=tile,
        idx_bits=idx_bits, m_valid=n,
    )
    row_spec = lambda ch: pl.BlockSpec((1, tile, ch), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM)
    full_spec = lambda ch: pl.BlockSpec((1, n_pad, ch), lambda i, j: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(c), full_spec(c), row_spec(1),
            row_spec(hdq), full_spec(hdq), full_spec(hdv), row_spec(hdv),
        ],
        out_specs=[row_spec(hdq), full_spec(hdq), full_spec(hdv)],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, hdq), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_pad, hdq), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_pad, hdv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the fused bwd's per-cell live set exceeds the 16 MB default
            # scoped-vmem stack at N=4096 (21.7 MB measured — the
            # train_step_cls_4096 bench row compile failure, round 5)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, xn, kth, q, k, v, g)
    return dq[:, :n], dk[:, :n], dv[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def n2p_attention_fused(q, k, v, xn, heads, scale, negate, subtract_v,
                        knn_k, interpret=False):
    """kNN-fused N2P local attention (selection + attention in one kernel).

    :param q: (B, N, H·Dq);  k: (B, N, H·Dq);  v: (B, N, H·Dv)
    :param xn: (B, N, C) pre-normalized kNN features
        (ops.neighbors.knn_normalized); carries no gradient — the reference
        stops gradients through the kNN graph too (indices are integers).
    :param knn_k: neighbors per row (static)
    :returns: (B, N, H·Dv)
    """
    out, _ = _n2p_fused_pallas_fwd(
        q, k, v, xn, heads, scale, negate, subtract_v, knn_k,
        interpret=interpret,
    )
    return out


def _n2p_fused_fwd(q, k, v, xn, heads, scale, negate, subtract_v, knn_k,
                   interpret=False):
    out, kth = _n2p_fused_pallas_fwd(
        q, k, v, xn, heads, scale, negate, subtract_v, knn_k,
        interpret=interpret,
    )
    return out, (q, k, v, xn, kth)


def _n2p_fused_bwd(heads, scale, negate, subtract_v, knn_k, interpret,
                   residuals, g):
    q, k, v, xn, kth = residuals
    dq, dk, dv = _n2p_fused_pallas_bwd(
        q, k, v, xn, kth, g.astype(q.dtype), heads, scale, negate,
        subtract_v, interpret=interpret,
    )
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(xn))


n2p_attention_fused.defvjp(_n2p_fused_fwd, _n2p_fused_bwd)


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# pallas_call has no GSPMD rule — unwrapped, a >1-device mesh would
# all-gather every operand and run the kernel replicated on each device.
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

n2p_attention = _spmd.data_parallel(n2p_attention, 4)
n2p_attention_fused = _spmd.data_parallel(n2p_attention_fused, 4)
