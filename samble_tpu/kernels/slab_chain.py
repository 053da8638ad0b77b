"""Fused EdgeConv slab chain: BN1-affine → leaky → conv2 → pooled stats.

After the fused kNN-gather produces the (B, K, N, C1) neighbor slab, the
XLA train path still pays ~10.8 ms (fwd+bwd, B=64, N=1024) for a chain
whose HBM roofline is ~2 ms (tools/probe_gather_kernels.py): BatchNorm
normalize, LeakyReLU, the 1×1 conv, the K-max, and every saved residual
each round-trip the 268 MB slab.  This kernel streams the slab ONCE per
direction and keeps everything else in VMEM:

  forward   y = leaky(s1·(u_i + w_nb) + b1);  z = y @ W2
            → zmax, zmin (B, N, C2);  Σz, Σz² (B, C2)

BN1's batch-moment affine (s1, b1) is computed OUTSIDE from a fused XLA
reduce over the virtual slab (the u-broadcast add fuses into the reduce,
so nothing materializes), which keeps the moment-coupling gradients on
XLA's exact autodiff path.  BN2 is then applied by the caller to the
POOLED values only (nn/common.py::bn_leaky_pool trick — BN2∘leaky is
per-channel monotone, so max commutes; Σz/Σz² are exactly its moments).

The custom VJP streams the slab once more: recompute y, z per tile
(bitwise identical chunking → exact max/min tie masks, even-split like
``jnp.max``'s gradient), route the pooled cotangents plus the moment
cotangents (dΣz, dΣz² enter every pair), and emit d w_nb, d u, d W2,
d s1, d b1.  Cross-grid accumulators (d W2, d s1, d b1) rely on the
sequential TPU grid, the established pattern of kernels/score.py.

Reference semantics: models/embedding.py:7-39 (EdgeConv conv stack),
:42-97 (STN front); exactness gate in tests/test_slab_chain.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _tile_for(n: int) -> int:
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


def _chunk_k(k: int) -> int:
    # 8 measured best on the full train step (r5 A/B: ck=8 1158 c/s,
    # ck=16 1150, ck=32 1141 — bigger chunks starve the ILP overlap)
    ck = min(8, k)
    while k % ck:
        ck -= 1
    return max(ck, 1)


def _fwd_kernel(wnb_ref, u_ref, s1_ref, b1_ref, w2_ref,
                zmax_ref, zmin_ref, zsum_ref, zsq_ref,
                *, knn_k: int, alpha: float):
    """One (batch, row-tile) cell.

    wnb_ref: (1, K, TILE, C1);  u_ref: (1, TILE, C1)
    s1/b1_ref: (1, C1) f32;     w2_ref: (C1, C2) f32
    zmax/zmin_ref: (1, TILE, C2) f32
    zsum/zsq_ref:  (1, 1, C2) f32 — accumulated over row tiles (j axis)
    """
    j = pl.program_id(1)
    tile, c1 = u_ref.shape[1], u_ref.shape[2]
    c2 = w2_ref.shape[1]
    ck = _chunk_k(knn_k)

    u = u_ref[0].astype(jnp.float32)  # (TILE, C1)
    s1 = s1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    w2d = w2_ref[...].astype(wnb_ref.dtype)  # MXU-rate operand dtype

    m = jnp.full((tile, c2), -jnp.inf, jnp.float32)
    mn = jnp.full((tile, c2), jnp.inf, jnp.float32)
    zs = jnp.zeros((1, c2), jnp.float32)
    zq = jnp.zeros((1, c2), jnp.float32)
    for k0 in range(0, knn_k, ck):
        g = wnb_ref[0, k0:k0 + ck].astype(jnp.float32) + u[None]
        y = _leaky(g * s1[None, None] + b1[None, None], alpha)
        z = jax.lax.dot_general(
            y.reshape(ck * tile, c1).astype(wnb_ref.dtype), w2d,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        m = jnp.maximum(m, jnp.max(z, axis=0))
        mn = jnp.minimum(mn, jnp.min(z, axis=0))
        zs = zs + jnp.sum(z, axis=(0, 1), keepdims=False)[None]
        zq = zq + jnp.sum(z * z, axis=(0, 1), keepdims=False)[None]

    zmax_ref[0] = m
    zmin_ref[0] = mn

    @pl.when(j == 0)
    def _():
        zsum_ref[0] = jnp.zeros_like(zsum_ref[0])
        zsq_ref[0] = jnp.zeros_like(zsq_ref[0])

    zsum_ref[0] += zs
    zsq_ref[0] += zq


def _bwd_kernel(wnb_ref, u_ref, s1_ref, b1_ref, w2_ref,
                zmax_ref, zmin_ref, dmax_ref, dmin_ref, dsum_ref, dsq_ref,
                dwnb_ref, du_ref, dw2_ref, ds1_ref, db1_ref,
                *, knn_k: int, alpha: float):
    """Backward cell: recompute y, z chunk-by-chunk (bitwise the forward's
    values), route pooled + moment cotangents, stream d w_nb out."""
    i, j = pl.program_id(0), pl.program_id(1)
    tile, c1 = u_ref.shape[1], u_ref.shape[2]
    c2 = w2_ref.shape[1]
    ck = _chunk_k(knn_k)

    u = u_ref[0].astype(jnp.float32)
    s1 = s1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    w2d = w2_ref[...].astype(wnb_ref.dtype)  # MXU-rate operand dtype
    zmax = zmax_ref[0]  # (TILE, C2) f32
    zmin = zmin_ref[0]
    dmax = dmax_ref[0].astype(jnp.float32)
    dmin = dmin_ref[0].astype(jnp.float32)
    dsum = dsum_ref[0, 0].astype(jnp.float32)  # (C2,)
    dsq = dsq_ref[0, 0].astype(jnp.float32)

    # tie counts for the even-split max/min subgradient (jnp.max semantics):
    # first sweep counts, second sweep routes — both recompute z exactly.
    cmx = jnp.zeros((tile, c2), jnp.float32)
    cmn = jnp.zeros((tile, c2), jnp.float32)
    for k0 in range(0, knn_k, ck):
        g = wnb_ref[0, k0:k0 + ck].astype(jnp.float32) + u[None]
        y = _leaky(g * s1[None, None] + b1[None, None], alpha)
        z = jax.lax.dot_general(
            y.reshape(ck * tile, c1).astype(wnb_ref.dtype), w2d,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        cmx = cmx + jnp.sum((z == zmax[None]).astype(jnp.float32), axis=0)
        cmn = cmn + jnp.sum((z == zmin[None]).astype(jnp.float32), axis=0)
    dmax_u = dmax / jnp.maximum(cmx, 1.0)
    dmin_u = dmin / jnp.maximum(cmn, 1.0)

    du_acc = jnp.zeros((tile, c1), jnp.float32)
    dw2_acc = jnp.zeros((c1, c2), jnp.float32)
    ds1_acc = jnp.zeros((1, c1), jnp.float32)
    db1_acc = jnp.zeros((1, c1), jnp.float32)
    for k0 in range(0, knn_k, ck):
        g = wnb_ref[0, k0:k0 + ck].astype(jnp.float32) + u[None]
        a = g * s1[None, None] + b1[None, None]
        y = _leaky(a, alpha)
        yf = y.reshape(ck * tile, c1).astype(wnb_ref.dtype)
        z = jax.lax.dot_general(
            yf, w2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        dz = (
            (z == zmax[None]).astype(jnp.float32) * dmax_u[None]
            + (z == zmin[None]).astype(jnp.float32) * dmin_u[None]
            + dsum[None, None]
            + 2.0 * z * dsq[None, None]
        )  # (CK, TILE, C2)
        dzf = dz.reshape(ck * tile, c2).astype(wnb_ref.dtype)
        dy = jax.lax.dot_general(
            dzf, w2d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c1)
        dw2_acc = dw2_acc + jax.lax.dot_general(
            yf, dzf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = dy * jnp.where(a >= 0, 1.0, alpha)
        dwnb_ref[0, k0:k0 + ck] = (da * s1[None, None]).astype(dwnb_ref.dtype)
        du_acc = du_acc + jnp.sum(da * s1[None, None], axis=0)
        ds1_acc = ds1_acc + jnp.sum(da * g, axis=(0, 1))[None]
        db1_acc = db1_acc + jnp.sum(da, axis=(0, 1))[None]

    du_ref[0] = du_acc.astype(du_ref.dtype)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        ds1_ref[0] = jnp.zeros_like(ds1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])

    dw2_ref[...] += dw2_acc
    ds1_ref[0] += ds1_acc
    db1_ref[0] += db1_acc


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _slab_chain_fwd_pallas(w_nb, u, s1, b1, w2, alpha: float,
                           interpret: bool = False):
    bsz, knn_k, n, c1 = w_nb.shape
    c2 = w2.shape[1]
    tile = _tile_for(n)
    grid = (bsz, n // tile)
    kern = functools.partial(_fwd_kernel, knn_k=knn_k, alpha=alpha)
    zmax, zmin, zsum, zsq = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, knn_k, tile, c1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w_nb, u, s1.reshape(1, -1), b1.reshape(1, -1), w2)
    return zmax, zmin, zsum[:, 0], zsq[:, 0]


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _slab_chain_bwd_pallas(w_nb, u, s1, b1, w2, zmax, zmin,
                           dmax, dmin, dsum, dsq, alpha: float,
                           interpret: bool = False):
    bsz, knn_k, n, c1 = w_nb.shape
    c2 = w2.shape[1]
    tile = _tile_for(n)
    grid = (bsz, n // tile)
    kern = functools.partial(_bwd_kernel, knn_k=knn_k, alpha=alpha)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, knn_k, tile, c1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, knn_k, tile, c1), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(w_nb.shape, w_nb.dtype),
            jax.ShapeDtypeStruct(u.shape, jnp.float32),
            jax.ShapeDtypeStruct((c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w_nb, u, s1.reshape(1, -1), b1.reshape(1, -1), w2, zmax, zmin,
      dmax, dmin, dsum[:, None], dsq[:, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def slab_chain(w_nb, u, s1, b1, w2, alpha: float = 0.2,
               interpret: bool = False):
    """Streamed ``leaky(s1·(u + w_nb) + b1) @ w2`` with pooled outputs.

    :param w_nb: (B, K, N, C1) gathered neighbor features (K-first)
    :param u: (B, N, C1) per-point term, broadcast over K
    :param s1: (C1,) f32 BN1 scale (γ1·rsqrt(var1+eps))
    :param b1: (C1,) f32 BN1 shift (β1 − μ1·s1)
    :param w2: (C1, C2) f32 conv kernel
    :returns: ``(zmax (B,N,C2), zmin (B,N,C2), zsum (B,C2), zsumsq (B,C2))``
        — per-point max/min of the pre-BN2 activations plus their moments'
        raw sums; all f32.  Differentiable in every array input.
    """
    return _slab_chain_fwd_pallas(w_nb, u, s1, b1, w2, alpha, interpret)


def _fwd(w_nb, u, s1, b1, w2, alpha, interpret):
    out = _slab_chain_fwd_pallas(w_nb, u, s1, b1, w2, alpha, interpret)
    zmax, zmin, _, _ = out
    return out, (w_nb, u, s1, b1, w2, zmax, zmin)


def _bwd(alpha, interpret, res, cts):
    w_nb, u, s1, b1, w2, zmax, zmin = res
    dmax, dmin, dsum, dsq = cts
    dwnb, du, dw2, ds1, db1 = _slab_chain_bwd_pallas(
        w_nb, u, s1, b1, w2, zmax, zmin,
        dmax.astype(jnp.float32), dmin.astype(jnp.float32),
        dsum.astype(jnp.float32), dsq.astype(jnp.float32),
        alpha, interpret,
    )
    return (dwnb, du.astype(u.dtype), ds1[0, 0].astype(s1.dtype),
            db1[0, 0].astype(b1.dtype), dw2.astype(w2.dtype))


slab_chain.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

slab_chain = _spmd.data_parallel(slab_chain, 2, n_replicated=3)


# ===========================================================================
# Composed variant: fused-kNN gather + slab chain with an IN-KERNEL backward
# scatter.  The standalone decomposition pays, per EdgeConv backward: the
# chain kernel's 268 MB d-slab write, an XLA pass adding the BN1
# moment-path cotangent (c0 + c1·g, formed by autodiff), and the standalone
# scatter kernel's read + one-hot builds.  Here the backward splits into a
# stats pass (B1: tie counts, dW2, direct ds1/db1, slab row sums) and a
# scatter pass (B2: recompute the chain, form the TOTAL per-pair cotangent
# dg = da·s1 + c0 + c1·g — moment corrections included analytically — and
# scatter it through the saved indices without the d-slab ever existing).
# The moment algebra is the closed-form BatchNorm backward established in
# kernels/edgeconv_train.py; exactness is gated differentially in
# tests/test_slab_chain.py.
# ===========================================================================


def _bwd_stats_kernel(wnb_ref, u_ref, s1_ref, b1_ref, w2_ref,
                      zmax_ref, zmin_ref, dmax_ref, dmin_ref,
                      dsum_ref, dsq_ref,
                      du_ref, srow_ref, dw2_ref, ds1_ref, db1_ref,
                      cmx_ref, cmn_ref,
                      *, knn_k: int, alpha: float):
    """B1: everything the backward needs EXCEPT the input-slab cotangent —
    identical math to _bwd_kernel minus the d w_nb stream, plus the tie
    counts (cmx/cmn) and slab row sums (srow = Σ_k w_nb) the caller uses to
    finish du and form the moment corrections."""
    i, j = pl.program_id(0), pl.program_id(1)
    tile, c1 = u_ref.shape[1], u_ref.shape[2]
    c2 = w2_ref.shape[1]
    ck = _chunk_k(knn_k)

    u = u_ref[0].astype(jnp.float32)
    s1 = s1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    w2d = w2_ref[...].astype(wnb_ref.dtype)
    zmax = zmax_ref[0]
    zmin = zmin_ref[0]
    dmax = dmax_ref[0].astype(jnp.float32)
    dmin = dmin_ref[0].astype(jnp.float32)
    dsum = dsum_ref[0, 0].astype(jnp.float32)
    dsq = dsq_ref[0, 0].astype(jnp.float32)

    cmx = jnp.zeros((tile, c2), jnp.float32)
    cmn = jnp.zeros((tile, c2), jnp.float32)
    srow = jnp.zeros((tile, c1), jnp.float32)
    for k0 in range(0, knn_k, ck):
        wnb = wnb_ref[0, k0:k0 + ck].astype(jnp.float32)
        srow = srow + jnp.sum(wnb, axis=0)
        g = wnb + u[None]
        y = _leaky(g * s1[None, None] + b1[None, None], alpha)
        z = jax.lax.dot_general(
            y.reshape(ck * tile, c1).astype(wnb_ref.dtype), w2d,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        cmx = cmx + jnp.sum((z == zmax[None]).astype(jnp.float32), axis=0)
        cmn = cmn + jnp.sum((z == zmin[None]).astype(jnp.float32), axis=0)
    cmx_ref[0] = cmx
    cmn_ref[0] = cmn
    srow_ref[0] = srow
    dmax_u = dmax / jnp.maximum(cmx, 1.0)
    dmin_u = dmin / jnp.maximum(cmn, 1.0)

    du_acc = jnp.zeros((tile, c1), jnp.float32)
    dw2_acc = jnp.zeros((c1, c2), jnp.float32)
    ds1_acc = jnp.zeros((1, c1), jnp.float32)
    db1_acc = jnp.zeros((1, c1), jnp.float32)
    for k0 in range(0, knn_k, ck):
        g = wnb_ref[0, k0:k0 + ck].astype(jnp.float32) + u[None]
        a = g * s1[None, None] + b1[None, None]
        y = _leaky(a, alpha)
        yf = y.reshape(ck * tile, c1).astype(wnb_ref.dtype)
        z = jax.lax.dot_general(
            yf, w2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        dz = (
            (z == zmax[None]).astype(jnp.float32) * dmax_u[None]
            + (z == zmin[None]).astype(jnp.float32) * dmin_u[None]
            + dsum[None, None]
            + 2.0 * z * dsq[None, None]
        )
        dzf = dz.reshape(ck * tile, c2).astype(wnb_ref.dtype)
        dy = jax.lax.dot_general(
            dzf, w2d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c1)
        dw2_acc = dw2_acc + jax.lax.dot_general(
            yf, dzf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = dy * jnp.where(a >= 0, 1.0, alpha)
        du_acc = du_acc + jnp.sum(da * s1[None, None], axis=0)
        ds1_acc = ds1_acc + jnp.sum(da * g, axis=(0, 1))[None]
        db1_acc = db1_acc + jnp.sum(da, axis=(0, 1))[None]

    du_ref[0] = du_acc

    @pl.when((i == 0) & (j == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        ds1_ref[0] = jnp.zeros_like(ds1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])

    dw2_ref[...] += dw2_acc
    ds1_ref[0] += ds1_acc
    db1_ref[0] += db1_acc


def _bwd_scatter_kernel(wnb_ref, u_ref, idx_ref, s1_ref, b1_ref, w2_ref,
                        zmax_ref, zmin_ref, dmaxu_ref, dminu_ref,
                        dsum_ref, dsq_ref, c0_ref, c1_ref,
                        dw_ref,
                        *, knn_k: int, alpha: float):
    """B2: recompute the chain per chunk, form the TOTAL per-pair input
    cotangent dg = da·s1 + c0 + c1·g (chain + BN1 moment path), and
    scatter-accumulate it into dw[j] through the saved neighbor indices —
    the (B, K, N, C1) cotangent slab never exists in HBM.

    dw_ref: (1, N, C1) f32 — accumulated across the row-tile grid axis.
    """
    from samble_tpu.kernels.gather import _sel_chunk

    j = pl.program_id(1)
    tile, c1 = u_ref.shape[1], u_ref.shape[2]
    c2 = w2_ref.shape[1]
    n = dw_ref.shape[1]
    ck = _chunk_k(knn_k)

    u = u_ref[0].astype(jnp.float32)
    idx = idx_ref[0]
    s1 = s1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    c0 = c0_ref[0].astype(jnp.float32)
    c1c = c1_ref[0].astype(jnp.float32)
    w2d = w2_ref[...].astype(wnb_ref.dtype)
    zmax = zmax_ref[0]
    zmin = zmin_ref[0]
    dmax_u = dmaxu_ref[0].astype(jnp.float32)
    dmin_u = dminu_ref[0].astype(jnp.float32)
    dsum = dsum_ref[0, 0].astype(jnp.float32)
    dsq = dsq_ref[0, 0].astype(jnp.float32)

    dw_acc = jnp.zeros((n, c1), jnp.float32)
    for k0 in range(0, knn_k, ck):
        g = wnb_ref[0, k0:k0 + ck].astype(jnp.float32) + u[None]
        a = g * s1[None, None] + b1[None, None]
        y = _leaky(a, alpha)
        yf = y.reshape(ck * tile, c1).astype(wnb_ref.dtype)
        z = jax.lax.dot_general(
            yf, w2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        dz = (
            (z == zmax[None]).astype(jnp.float32) * dmax_u[None]
            + (z == zmin[None]).astype(jnp.float32) * dmin_u[None]
            + dsum[None, None]
            + 2.0 * z * dsq[None, None]
        )
        dzf = dz.reshape(ck * tile, c2).astype(wnb_ref.dtype)
        dy = jax.lax.dot_general(
            dzf, w2d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c1)
        da = dy * jnp.where(a >= 0, 1.0, alpha)
        dg = da * s1[None, None] + c0[None, None] + c1c[None, None] * g
        sel = _sel_chunk(k0, ck, idx, n, wnb_ref.dtype)
        dw_acc = dw_acc + jax.lax.dot_general(
            sel, dg.reshape(ck * tile, c1).astype(wnb_ref.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == 0)
    def _():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])

    dw_ref[0] += dw_acc


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _bwd_stats_pallas(w_nb, u, s1, b1, w2, zmax, zmin,
                      dmax, dmin, dsum, dsq, alpha: float,
                      interpret: bool = False):
    bsz, knn_k, n, c1 = w_nb.shape
    c2 = w2.shape[1]
    tile = _tile_for(n)
    grid = (bsz, n // tile)
    kern = functools.partial(_bwd_stats_kernel, knn_k=knn_k, alpha=alpha)
    row = lambda i, j: (i, j, 0)
    bsp = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsp((1, knn_k, tile, c1), lambda i, j: (i, 0, j, 0)),
            bsp((1, tile, c1), row),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((c1, c2), lambda i, j: (0, 0)),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, 1, c2), lambda i, j: (i, 0, 0)),
            bsp((1, 1, c2), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            bsp((1, tile, c1), row),            # du_lin
            bsp((1, tile, c1), row),            # srow
            bsp((c1, c2), lambda i, j: (0, 0)),  # dw2
            bsp((1, 1, c1), lambda i, j: (0, 0, 0)),  # ds1
            bsp((1, 1, c1), lambda i, j: (0, 0, 0)),  # db1
            bsp((1, tile, c2), row),            # cmx
            bsp((1, tile, c2), row),            # cmn
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w_nb, u, s1.reshape(1, -1), b1.reshape(1, -1), w2, zmax, zmin,
      dmax, dmin, dsum[:, None], dsq[:, None])


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _bwd_scatter_pallas(w_nb, u, idx, s1, b1, w2, zmax, zmin,
                        dmax_u, dmin_u, dsum, dsq, c0, c1v, alpha: float,
                        interpret: bool = False):
    bsz, knn_k, n, c1 = w_nb.shape
    c2 = w2.shape[1]
    tile = _tile_for(n)
    grid = (bsz, n // tile)
    kern = functools.partial(_bwd_scatter_kernel, knn_k=knn_k, alpha=alpha)
    row = lambda i, j: (i, j, 0)
    bsp = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsp((1, knn_k, tile, c1), lambda i, j: (i, 0, j, 0)),
            bsp((1, tile, c1), row),
            bsp((1, tile, knn_k), row),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((c1, c2), lambda i, j: (0, 0)),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, 1, c2), lambda i, j: (i, 0, 0)),
            bsp((1, 1, c2), lambda i, j: (i, 0, 0)),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((1, c1), lambda i, j: (0, 0)),
        ],
        out_specs=bsp((1, n, c1), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w_nb, u, idx, s1.reshape(1, -1), b1.reshape(1, -1), w2, zmax, zmin,
      dmax_u, dmin_u, dsum[:, None], dsq[:, None],
      c0.reshape(1, -1), c1v.reshape(1, -1))


def _bwd_merged_kernel(wnb_ref, u_ref, idx_ref, s1_ref, b1_ref, w2_ref,
                       zmax_ref, zmin_ref, dmax_ref, dmin_ref,
                       dsum_ref, dsq_ref,
                       dwc_ref, umix_ref, du_ref, srow_ref,
                       dw2_ref, ds1_ref, db1_ref,
                       *, knn_k: int, alpha: float):
    """Merged backward: ONE kernel, two k-sweeps.

    Sweep 1 recomputes z per chunk for the max/min tie counts (jnp.max
    even-split semantics) and row-sums the slab (srow = Σ_k w_nb).  Sweep 2
    recomputes the chain once, accumulates every parameter/moment sum
    (dw2, ds1, db1, du_lin) and scatters TWO right-hand sides through the
    same per-chunk selection matrix:

      * the chain cotangent  da·s1        → dwc   (B, N, C1)
      * the constant block   [u | 1 | 0]  → umix  (B, N, 128):
        umix[..., :C1] = Σ_{pairs→m} u[t]  (uscat),
        umix[..., C1]  = indegree(m).

    The BN1 moment correction (c0 + c1·g per pair) is closed OUTSIDE in
    XLA via  Σ_{pairs→m}(c0 + c1⊙g) = indeg·c0 + c1⊙(indeg·w[m] + uscat)
    — exact because the gathered value of every pair targeting m IS w[m].
    Vs the B1+B2 split this deletes one full chain-recompute sweep and the
    cmx/cmn/dmax_u/dmin_u HBM round-trips; the extra umix matmul rides the
    MXU lane padding (C1=64 → the 128-lane tile was half empty anyway).
    """
    from samble_tpu.kernels.gather import _sel_chunk

    i, j = pl.program_id(0), pl.program_id(1)
    tile, c1 = u_ref.shape[1], u_ref.shape[2]
    c2 = w2_ref.shape[1]
    n = dwc_ref.shape[1]
    mix_w = umix_ref.shape[2]
    ck = _chunk_k(knn_k)

    u = u_ref[0].astype(jnp.float32)
    idx = idx_ref[0]
    s1 = s1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    w2d = w2_ref[...].astype(wnb_ref.dtype)
    zmax = zmax_ref[0]
    zmin = zmin_ref[0]
    dmax = dmax_ref[0].astype(jnp.float32)
    dmin = dmin_ref[0].astype(jnp.float32)
    dsum = dsum_ref[0, 0].astype(jnp.float32)
    dsq = dsq_ref[0, 0].astype(jnp.float32)

    # sweep 1: tie counts + slab row sums
    cmx = jnp.zeros((tile, c2), jnp.float32)
    cmn = jnp.zeros((tile, c2), jnp.float32)
    srow = jnp.zeros((tile, c1), jnp.float32)
    for k0 in range(0, knn_k, ck):
        wnb = wnb_ref[0, k0:k0 + ck].astype(jnp.float32)
        srow = srow + jnp.sum(wnb, axis=0)
        y = _leaky((wnb + u[None]) * s1[None, None] + b1[None, None], alpha)
        z = jax.lax.dot_general(
            y.reshape(ck * tile, c1).astype(wnb_ref.dtype), w2d,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        cmx = cmx + jnp.sum((z == zmax[None]).astype(jnp.float32), axis=0)
        cmn = cmn + jnp.sum((z == zmin[None]).astype(jnp.float32), axis=0)
    srow_ref[0] = srow
    dmax_u = dmax / jnp.maximum(cmx, 1.0)
    dmin_u = dmin / jnp.maximum(cmn, 1.0)

    # cotangent-independent scatter rhs: [u | 1 | 0-pad], built once
    one_col = (jax.lax.broadcasted_iota(jnp.int32, (tile, mix_w - c1), 1)
               == 0).astype(jnp.float32)
    u_pad = jnp.concatenate([u, one_col], axis=1)  # (TILE, MIXW) f32
    u_rep = jnp.broadcast_to(u_pad[None], (ck, tile, mix_w)).reshape(
        ck * tile, mix_w).astype(wnb_ref.dtype)

    # sweep 2: route + all accumulations + both scatters
    du_acc = jnp.zeros((tile, c1), jnp.float32)
    dw2_acc = jnp.zeros((c1, c2), jnp.float32)
    ds1_acc = jnp.zeros((1, c1), jnp.float32)
    db1_acc = jnp.zeros((1, c1), jnp.float32)
    dwc_acc = jnp.zeros((n, c1), jnp.float32)
    umix_acc = jnp.zeros((n, mix_w), jnp.float32)
    for k0 in range(0, knn_k, ck):
        g = wnb_ref[0, k0:k0 + ck].astype(jnp.float32) + u[None]
        a = g * s1[None, None] + b1[None, None]
        y = _leaky(a, alpha)
        yf = y.reshape(ck * tile, c1).astype(wnb_ref.dtype)
        z = jax.lax.dot_general(
            yf, w2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c2)
        dz = (
            (z == zmax[None]).astype(jnp.float32) * dmax_u[None]
            + (z == zmin[None]).astype(jnp.float32) * dmin_u[None]
            + dsum[None, None]
            + 2.0 * z * dsq[None, None]
        )
        dzf = dz.reshape(ck * tile, c2).astype(wnb_ref.dtype)
        dy = jax.lax.dot_general(
            dzf, w2d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ck, tile, c1)
        dw2_acc = dw2_acc + jax.lax.dot_general(
            yf, dzf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da = dy * jnp.where(a >= 0, 1.0, alpha)
        das1 = da * s1[None, None]
        du_acc = du_acc + jnp.sum(das1, axis=0)
        ds1_acc = ds1_acc + jnp.sum(da * g, axis=(0, 1))[None]
        db1_acc = db1_acc + jnp.sum(da, axis=(0, 1))[None]
        sel = _sel_chunk(k0, ck, idx, n, wnb_ref.dtype)
        dwc_acc = dwc_acc + jax.lax.dot_general(
            sel, das1.reshape(ck * tile, c1).astype(wnb_ref.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        umix_acc = umix_acc + jax.lax.dot_general(
            sel, u_rep, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    du_ref[0] = du_acc

    @pl.when(j == 0)
    def _():
        dwc_ref[0] = jnp.zeros_like(dwc_ref[0])
        umix_ref[0] = jnp.zeros_like(umix_ref[0])

    dwc_ref[0] += dwc_acc
    umix_ref[0] += umix_acc

    @pl.when((i == 0) & (j == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        ds1_ref[0] = jnp.zeros_like(ds1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])

    dw2_ref[...] += dw2_acc
    ds1_ref[0] += ds1_acc
    db1_ref[0] += db1_acc


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _bwd_merged_pallas(w_nb, u, idx, s1, b1, w2, zmax, zmin,
                       dmax, dmin, dsum, dsq, alpha: float,
                       interpret: bool = False):
    bsz, knn_k, n, c1 = w_nb.shape
    c2 = w2.shape[1]
    tile = _tile_for(n)
    mix_w = 128 if c1 < 128 else c1 + 8
    grid = (bsz, n // tile)
    kern = functools.partial(_bwd_merged_kernel, knn_k=knn_k, alpha=alpha)
    row = lambda i, j: (i, j, 0)
    bsp = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsp((1, knn_k, tile, c1), lambda i, j: (i, 0, j, 0)),
            bsp((1, tile, c1), row),
            bsp((1, tile, knn_k), row),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((1, c1), lambda i, j: (0, 0)),
            bsp((c1, c2), lambda i, j: (0, 0)),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, tile, c2), row),
            bsp((1, 1, c2), lambda i, j: (i, 0, 0)),
            bsp((1, 1, c2), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            bsp((1, n, c1), lambda i, j: (i, 0, 0)),      # dwc
            bsp((1, n, mix_w), lambda i, j: (i, 0, 0)),   # umix
            bsp((1, tile, c1), row),                      # du_lin
            bsp((1, tile, c1), row),                      # srow
            bsp((c1, c2), lambda i, j: (0, 0)),           # dw2
            bsp((1, 1, c1), lambda i, j: (0, 0, 0)),      # ds1
            bsp((1, 1, c1), lambda i, j: (0, 0, 0)),      # db1
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, mix_w), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w_nb, u, idx, s1.reshape(1, -1), b1.reshape(1, -1), w2, zmax, zmin,
      dmax, dmin, dsum[:, None], dsq[:, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def slab_chain_knn(w, u, xn, gamma1, beta1, w2, knn_k: int,
                   alpha: float = 0.2, interpret: bool = False,
                   axis_name=None):
    """Fused-kNN gather + BN1 + slab chain with an in-kernel backward scatter.

    Takes the BN1 parameters (γ, β) directly: the batch moments, the
    normalize affine, the chain, and the ENTIRE BatchNorm batch-moment
    backward (the c0 + c1·g per-pair correction, folded into the scatter
    pass) live inside this one custom-VJP unit, so the (B, K, N, C1)
    cotangent slab never exists in HBM and no separate scatter kernel runs.

    :returns: ``(zmax, zmin, zsum, zsumsq, mu1, var1)`` — the last two are
        the BN1 batch moments for the caller's running-stat update and MUST
        be consumed under stop_gradient (their cotangents are ignored; the
        moment path is already accounted for analytically).
    ``axis_name`` (injected by kernels/spmd.py under a mesh) makes the
    moments and the moment-coupling sums global across shards — SyncBN.
    """
    return _knn_fwd(w, u, xn, gamma1, beta1, w2, knn_k, alpha, interpret,
                    axis_name)[0]


def _use_merged_bwd() -> bool:
    # Default 'split' (B1 stats + B2 scatter): the merged single-kernel
    # backward was measured SLOWER on TPU — same-session A/B on the full
    # cls train step (bs=64, N=1024, bf16): split 1179.6 clouds/s, merged
    # 1121.3.  The extra umix selection matmul (128-lane rhs vs the 64-wide
    # chain cotangent) costs more than the deleted chain-recompute sweep —
    # the scatter matmul's N-wide output makes any ADDED scatter rhs ~16x
    # the price of the z/dy chain matmuls it saves (docs/kernels.md,
    # round-5 memo).  Kept selectable for the record: SAMBLE_SLAB_BWD=merged.
    import os

    return os.environ.get("SAMBLE_SLAB_BWD", "split") == "merged"


def _knn_fwd(w, u, xn, gamma1, beta1, w2, knn_k, alpha, interpret,
             axis_name):
    from samble_tpu.kernels.gather import _gather_knn_pallas

    w_nb, idx = _gather_knn_pallas(w, xn, knn_k, interpret)
    gv = w_nb.astype(jnp.float32) + u.astype(jnp.float32)[:, None]
    mu1 = jnp.mean(gv, axis=(0, 1, 2))
    m2 = jnp.mean(jnp.square(gv), axis=(0, 1, 2))
    if axis_name is not None:
        mu1 = jax.lax.pmean(mu1, axis_name)
        m2 = jax.lax.pmean(m2, axis_name)
    var1 = m2 - jnp.square(mu1)
    s1 = gamma1 * jax.lax.rsqrt(var1 + 1e-5)
    b1 = beta1 - mu1 * s1
    zmax, zmin, zsum, zsq = _slab_chain_fwd_pallas(
        w_nb, u, s1, b1, w2, alpha, interpret
    )
    out = (zmax, zmin, zsum, zsq, mu1, var1)
    return out, (w, w_nb, idx, u, s1, b1, w2, mu1, var1, zmax, zmin)


def _knn_bwd(knn_k, alpha, interpret, axis_name, res, cts):
    w, w_nb, idx, u, s1, b1, w2, mu1, var1, zmax, zmin = res
    # mu1/var1 cotangents are intentionally dropped (docstring contract)
    dmax, dmin, dsum, dsq = (c.astype(jnp.float32) for c in cts[:4])
    k = w_nb.shape[1]
    p = w_nb.shape[0] * k * w_nb.shape[2]
    merged = _use_merged_bwd()

    if merged:
        (dwc, umix, du_lin, srow, dw2, ds1, db1) = _bwd_merged_pallas(
            w_nb, u, idx, s1, b1, w2, zmax, zmin, dmax, dmin, dsum, dsq,
            alpha, interpret,
        )
        c1_dim = w_nb.shape[3]
        uscat = umix[..., :c1_dim]
        indeg = umix[..., c1_dim]  # (B, N)
    else:
        du_lin, srow, dw2, ds1, db1, cmx, cmn = _bwd_stats_pallas(
            w_nb, u, s1, b1, w2, zmax, zmin, dmax, dmin, dsum, dsq,
            alpha, interpret,
        )
        dmax_u = dmax / jnp.maximum(cmx, 1.0)
        dmin_u = dmin / jnp.maximum(cmn, 1.0)
    ds1 = ds1[0, 0]
    db1 = db1[0, 0]

    # closed-form BatchNorm moment backward; global across shards
    ds1_g, db1_g, p_g = ds1, db1, p
    if axis_name is not None:
        ds1_g = jax.lax.psum(ds1, axis_name)
        db1_g = jax.lax.psum(db1, axis_name)
        p_g = p * jax.lax.psum(1, axis_name)
    d_var = (ds1_g - mu1 * db1_g) * (-0.5) * s1 / (var1 + 1e-5)
    d_mu = -s1 * db1_g
    c1v = 2.0 * d_var / p_g
    c0 = d_mu / p_g - 2.0 * mu1 * d_var / p_g

    if merged:
        # moment-path scatter closed analytically: every pair targeting
        # point m gathered exactly w[m], so
        #   Σ_{pairs→m}(c0 + c1⊙g) = indeg·c0 + c1⊙(indeg·w[m] + uscat)
        dw = (dwc
              + indeg[..., None] * (c0[None, None]
                                    + c1v[None, None] * w.astype(jnp.float32))
              + c1v[None, None] * uscat)
    else:
        dw = _bwd_scatter_pallas(
            w_nb, u, idx, s1, b1, w2, zmax, zmin, dmax_u, dmin_u,
            dsum, dsq, c0, c1v, alpha, interpret,
        )
    # du = Σ_k dg = du_lin + K·c0 + c1·(K·u + Σ_k w_nb)
    du = (du_lin + k * c0[None, None]
          + c1v[None, None] * (k * u.astype(jnp.float32) + srow))
    # γ/β direct-path gradients (s1 = γ·r, b1 = β − μ·s1, r = rsqrt(var+eps));
    # LOCAL sums — shard_map psums replicated-input cotangents itself
    r = jax.lax.rsqrt(var1 + 1e-5)
    dgamma = ds1 * r - mu1 * r * db1
    dbeta = db1
    return (dw.astype(w_nb.dtype), du.astype(u.dtype), None,
            dgamma, dbeta, dw2.astype(w2.dtype))


slab_chain_knn.defvjp(_knn_fwd, _knn_bwd)

slab_chain_knn = _spmd.data_parallel(
    slab_chain_knn, 3, n_replicated=3, axis_arg_index=9,
    # (zmax, zmin, zsum, zsq) batch-sharded; (mu1, var1) pmean-replicated
    out_specs_fn=lambda ax: (_spmd.P(ax),) * 4 + (_spmd.P(),) * 2,
)
