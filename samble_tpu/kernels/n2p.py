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

Differentiable via jax.custom_vjp: the backward pass recomputes the
dense-masked XLA formulation (exact same math) and differentiates that —
training takes the dense cost, serving takes the fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    tile = 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
        # padded query rows attend to column 0 (real); sliced off below
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))

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
    tile = 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q, k, v, g = (jnp.pad(a, pad) for a in (q, k, v, g))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))

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
