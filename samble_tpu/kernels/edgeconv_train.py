"""Fused train-mode EdgeConv: BN→leaky→conv→BN→leaky→max without the slab.

The train path of every EdgeConv-shaped block (EdgeConv ×2 in both models,
the STN front) materializes a (B, K, N, C) grouped tensor and runs two
BatchNorm+conv stages plus their autodiff over it — 67% of the seg train
step (docs/kernels.md whole-step table).  This module computes the same
function and the same gradients with nothing O(B·K·N·C) in HBM:

  forward      out_i = max_k leaky(BN2(W2ᵀ leaky(BN1(u_i + w_{j(i,k)}))))

* **BN1 moments are closed-form.**  The pre-activation is the rank-1 pair
  sum g_ij = u_i + w_j, so its population sums over all (i, k) pairs need
  only the per-row neighbor sums s_i = Σ_k w_j and s2_i = Σ_k w_j² — one
  extraction pass (kernel A) accumulates them (plus the transpose sums
  t_j = Σ_in u_i and in-degrees used by the backward) and emits the
  neighbor indices.
* **BN2 never needs the pairs either.**  BN2∘leaky is per-channel
  monotone (direction = sign γ2), so max_k h = h(max_k y) or h(min_k y);
  kernel B streams the pairs once (one-hot from stored indices — 1 compare
  per neighbor instead of the 3-op extraction), tracking per-(i, c2)
  running max/min/argmax/argmin of the pre-BN2 y and the global Σy, Σy²
  the moments need.
* **The backward is one streamed pass + closed-form corrections.**  The
  BN backward's moment-coupling terms reduce to per-channel scalars
  (m̄, c̄ for BN2 — computable from the selected pairs only; ā, b̄ for BN1 —
  they ARE dβ1/P and dγ1/P, accumulated by the same pass), so kernel C
  recomputes each pair once, applies the dense-plus-sparse dy, and
  accumulates du, dw (one-hot-transpose scatter), dW2, dγ1, dβ1; the BN1
  moment corrections to du/dw are applied afterwards in XLA using the
  kernel-A statistics.  All gradients are exact (the usual BatchNorm
  batch-moment backward), verified against jax.grad of the slab chain in
  tests/test_kernels.py.

Population = every (row, neighbor) pair of the batch, matching BatchNorm
over a (B, K, N, C) tensor (reference models/embedding.py:7-39 semantics;
biased variance, eps 1e-5).  Gradients do not flow into the kNN features
``xn`` (neighbor indices are integers in the reference too).

Grid-accumulated outputs (constant / per-batch index maps) rely on the
sequential TPU grid — the established pattern of kernels/score.py and
kernels/gather.py.
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


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _tile_for(n: int) -> int:
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


# --------------------------------------------------------------------------
# kernel A: extraction + neighbor statistics
# --------------------------------------------------------------------------


def _stats_kernel(xa_ref, xb_ref, u_ref, w_ref,
                  idx_ref, s_ref, s2_ref, t_ref, deg_ref,
                  *, knn_k: int, idx_bits: int, m_valid: int):
    """Packed-key extraction emitting idx plus the BN-moment statistics.

    xa_ref: (1, TILE, CX)  normalized kNN features, tile rows
    xb_ref: (1, NPAD, CX)  normalized kNN features, all rows
    u_ref:  (1, TILE, C1); w_ref: (1, N, C1)
    idx_ref: (1, TILE, K) int32
    s_ref:  (1, TILE, C1)  Σ_k w_sel        (row neighbor sums)
    s2_ref: (1, TILE, C1)  Σ_k w_sel²
    t_ref:  (1, N, C1)     Σ_in u_i          (accumulated across row tiles)
    deg_ref:(1, 1, N)      in-degrees        (accumulated across row tiles)
    """
    j = pl.program_id(1)
    u = u_ref[0]
    w = w_ref[0]
    tile = u.shape[0]
    c1 = w.shape[-1]
    low_mask = (1 << idx_bits) - 1

    pool0 = keys_mod.packed_key_tile(xa_ref[0], xb_ref[0], idx_bits, m_valid)
    w2sq = w * w

    @pl.when(j == 0)
    def _init():
        t_ref[0] = jnp.zeros_like(t_ref[0])
        deg_ref[0] = jnp.zeros_like(deg_ref[0])

    budget = max(1, (16 * 1024) // w.shape[0])
    unroll = next(v for v in (8, 4, 2, 1) if v <= budget and knn_k % v == 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile, knn_k), 1)

    def round_(r, carry):
        pool, idx_acc, s, s2, t_acc, deg_acc = carry
        for i in range(unroll):
            k = r * unroll + i
            kmin = jnp.min(pool, axis=1, keepdims=True)
            onehot = (pool == kmin)
            pool = jnp.where(onehot, keys_mod.INTMAX, pool)
            oh = onehot.astype(jnp.float32)
            s = s + jax.lax.dot_general(
                oh, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s2 = s2 + jax.lax.dot_general(
                oh, w2sq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t_acc = t_acc + jax.lax.dot_general(
                oh, u, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (NPAD_cols?, C1) — (N, C1)
            deg_acc = deg_acc + jnp.sum(oh, axis=0, keepdims=True)
            idx_acc = jnp.where(slot == k, kmin & low_mask, idx_acc)
        return pool, idx_acc, s, s2, t_acc, deg_acc

    n_cols = w.shape[0]
    init = (
        pool0,
        jnp.zeros((tile, knn_k), jnp.int32),
        jnp.zeros((tile, c1), jnp.float32),
        jnp.zeros((tile, c1), jnp.float32),
        jnp.zeros((n_cols, c1), jnp.float32),
        jnp.zeros((1, n_cols), jnp.float32),
    )
    _, idx_acc, s, s2, t_acc, deg_acc = jax.lax.fori_loop(
        0, knn_k // unroll, round_, init
    )
    idx_ref[0] = idx_acc
    s_ref[0] = s
    s2_ref[0] = s2
    t_ref[0] += t_acc
    deg_ref[0] += deg_acc


@functools.partial(jax.jit, static_argnames=("knn_k", "interpret"))
def _stats_pallas(u, w, xn, knn_k: int, interpret: bool = False):
    bsz, n, c1 = w.shape
    cx = xn.shape[-1]
    tile = _tile_for(n)
    idx_bits = keys_mod.packing_bits(_round_up(n, 128))
    grid = (bsz, n // tile)
    kernel = functools.partial(
        _stats_kernel, knn_k=knn_k, idx_bits=idx_bits, m_valid=n
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cx), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cx), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, knn_k), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, xn, u, w)


# --------------------------------------------------------------------------
# kernel B: forward stream (max/min/arg + BN2 population sums)
# --------------------------------------------------------------------------


def _fwd_kernel(idx_ref, ux_ref, wx_ref, g1_ref, b1_ref, w2_ref,
                ymax_ref, ymin_ref, amax_ref, amin_ref, ysum_ref, ysum2_ref,
                *, knn_k: int, alpha: float):
    """idx-driven pair stream: y = leaky(γ1·(ux_i + wx_j) + β1) @ W2.

    ux_ref: (1, TILE, C1) = (u − μ1)/σ1;  wx_ref: (1, N, C1) = w/σ1
    g1/b1: (1, C1);  w2: (C1, C2)
    ymax/ymin: (1, TILE, C2) f32;  amax/amin: (1, TILE, C2) int32
    ysum/ysum2: (1, 1, C2) — accumulated across the WHOLE grid
    """
    i, j = pl.program_id(0), pl.program_id(1)
    idx = idx_ref[0]
    ux = ux_ref[0]
    wx = wx_ref[0]
    g1 = g1_ref[0]
    b1 = b1_ref[0]
    w2 = w2_ref[:]
    tile, n = idx.shape[0], wx.shape[0]
    c2 = w2.shape[1]

    @pl.when((i == 0) & (j == 0))
    def _init():
        ysum_ref[0] = jnp.zeros_like(ysum_ref[0])
        ysum2_ref[0] = jnp.zeros_like(ysum2_ref[0])

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile, knn_k), 1)

    # partial unroll for matmul ILP (rolled loops serialize the per-round
    # matmuls, docs/kernels.md compiler lessons); Mosaic cannot
    # dynamic-slice register arrays, so idx[:, k] with a traced k is read
    # via a slot compare + row sum (K lanes — cheap)
    budget = max(1, (16 * 1024) // n)
    unroll = next(v for v in (8, 4, 2, 1) if v <= budget and knn_k % v == 0)

    def round_(r, carry):
        ymax, ymin, amax, amin, ys, ys2 = carry
        for off in range(unroll):
            k = r * unroll + off
            target = jnp.sum(
                jnp.where(slot == k, idx, 0), axis=1, keepdims=True
            )  # (TILE, 1)
            onehot = (col == target).astype(jnp.float32)
            wx_sel = jax.lax.dot_general(
                onehot, wx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            q = g1 * (ux + wx_sel) + b1
            z = _leaky(q, alpha)
            y = jax.lax.dot_general(
                z, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TILE, C2)
            upd_max = y > ymax
            upd_min = y < ymin
            amax = jnp.where(upd_max, k, amax)
            amin = jnp.where(upd_min, k, amin)
            ymax = jnp.where(upd_max, y, ymax)
            ymin = jnp.where(upd_min, y, ymin)
            ys = ys + jnp.sum(y, axis=0, keepdims=True)
            ys2 = ys2 + jnp.sum(y * y, axis=0, keepdims=True)
        return ymax, ymin, amax, amin, ys, ys2

    init = (
        jnp.full((tile, c2), -jnp.inf, jnp.float32),
        jnp.full((tile, c2), jnp.inf, jnp.float32),
        jnp.zeros((tile, c2), jnp.int32),
        jnp.zeros((tile, c2), jnp.int32),
        jnp.zeros((1, c2), jnp.float32),
        jnp.zeros((1, c2), jnp.float32),
    )
    ymax, ymin, amax, amin, ys, ys2 = jax.lax.fori_loop(
        0, knn_k // unroll, round_, init
    )
    ymax_ref[0] = ymax
    ymin_ref[0] = ymin
    amax_ref[0] = amax
    amin_ref[0] = amin
    ysum_ref[0] += ys
    ysum2_ref[0] += ys2


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _fwd_pallas(idx, ux, wx, g1, b1, w2, alpha: float,
                interpret: bool = False):
    bsz, n, c1 = ux.shape
    knn_k = idx.shape[-1]
    c2 = w2.shape[1]
    tile = _tile_for(n)
    grid = (bsz, n // tile)
    kernel = functools.partial(_fwd_kernel, knn_k=knn_k, alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0),
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
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.int32),
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.int32),
            jax.ShapeDtypeStruct((1, 1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, c2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx, ux, wx, g1.reshape(1, c1), b1.reshape(1, c1), w2)


# --------------------------------------------------------------------------
# kernel C: backward stream
# --------------------------------------------------------------------------


def _bwd_kernel(idx_ref, ux_ref, wx_ref, g1_ref, b1_ref, w2_ref,
                dsel_ref, asel_ref, e0_ref, e1_ref,
                du_ref, dw_ref, dw2_ref, dg1_ref, db1_ref,
                *, knn_k: int, alpha: float):
    """Backward pair stream (see module docstring for the math).

    dsel: (1, TILE, C2) = (γ2/σ2)·dr at the selected pair, else meaningless
    asel: (1, TILE, C2) int32 — the selected k per (row, out-channel)
    e0/e1: (1, C2) — the dense BN2-moment term dy_dense = e0 + e1·y
    du: (1, TILE, C1) Σ_k dq;  dw: (1, N, C1) Σ_in dq (accumulated / batch)
    dw2: (C1, C2);  dg1/db1: (1, C1) — accumulated across the WHOLE grid
    """
    i, j = pl.program_id(0), pl.program_id(1)
    idx = idx_ref[0]
    ux = ux_ref[0]
    wx = wx_ref[0]
    g1 = g1_ref[0]
    b1 = b1_ref[0]
    w2 = w2_ref[:]
    dsel = dsel_ref[0]
    asel = asel_ref[0]
    e0 = e0_ref[0]
    e1 = e1_ref[0]
    tile, n = idx.shape[0], wx.shape[0]
    c1 = wx.shape[-1]

    @pl.when((i == 0) & (j == 0))
    def _init_glob():
        dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
        dg1_ref[:] = jnp.zeros_like(dg1_ref[:])
        db1_ref[:] = jnp.zeros_like(db1_ref[:])

    @pl.when(j == 0)
    def _init_batch():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tile, knn_k), 1)
    budget = max(1, (8 * 1024) // n)  # 4 matmuls/round live — half budget
    unroll = next(v for v in (8, 4, 2, 1) if v <= budget and knn_k % v == 0)

    def round_(r, carry):
        du, dw_acc, dw2, dg1, db1 = carry
        for off in range(unroll):
            k = r * unroll + off
            target = jnp.sum(
                jnp.where(slot == k, idx, 0), axis=1, keepdims=True
            )
            onehot = (col == target).astype(jnp.float32)
            wx_sel = jax.lax.dot_general(
                onehot, wx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xhat = ux + wx_sel
            q = g1 * xhat + b1
            z = _leaky(q, alpha)
            y = jax.lax.dot_general(
                z, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dy = jnp.where(asel == k, dsel, 0.0) + e0 + e1 * y  # (TILE, C2)
            dw2 = dw2 + jax.lax.dot_general(
                z, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (C1, C2)
            dz = jax.lax.dot_general(
                dy, w2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TILE, C1)
            dq = jnp.where(q >= 0, dz, alpha * dz)
            du = du + dq
            dw_acc = dw_acc + jax.lax.dot_general(
                onehot, dq, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (N, C1)
            db1 = db1 + jnp.sum(dq, axis=0, keepdims=True)
            dg1 = dg1 + jnp.sum(dq * xhat, axis=0, keepdims=True)
        return du, dw_acc, dw2, dg1, db1

    init = (
        jnp.zeros((tile, c1), jnp.float32),
        jnp.zeros((n, c1), jnp.float32),
        jnp.zeros(w2.shape, jnp.float32),
        jnp.zeros((1, c1), jnp.float32),
        jnp.zeros((1, c1), jnp.float32),
    )
    du, dw_acc, dw2, dg1, db1 = jax.lax.fori_loop(
        0, knn_k // unroll, round_, init
    )
    du_ref[0] = du
    dw_ref[0] += dw_acc
    dw2_ref[:] += dw2
    dg1_ref[:] += dg1
    db1_ref[:] += db1


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _bwd_pallas(idx, ux, wx, g1, b1, w2, dsel, asel, e0, e1,
                alpha: float, interpret: bool = False):
    bsz, n, c1 = ux.shape
    knn_k = idx.shape[-1]
    c2 = w2.shape[1]
    tile = _tile_for(n)
    grid = (bsz, n // tile)
    kernel = functools.partial(_bwd_kernel, knn_k=knn_k, alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, knn_k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0),
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
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, c1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx, ux, wx, g1.reshape(1, c1), b1.reshape(1, c1), w2,
      dsel, asel, e0.reshape(1, c2), e1.reshape(1, c2))


# --------------------------------------------------------------------------
# custom-vjp wrapper
# --------------------------------------------------------------------------

EPS = 1e-5


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def edgeconv_train(knn_k: int, alpha: float, interpret: bool,
                   u, w, xn, gamma1, beta1, w2, gamma2, beta2):
    """Train-mode fused EdgeConv block.

    :param u: (B, N, C1) center term (pre-BN1, conv1 hoisted)
    :param w: (B, N, C1) neighbor term
    :param xn: (B, N, CX) pre-normalized kNN features (no gradient)
    :param gamma1/beta1: (C1,) BN1 affine;  gamma2/beta2: (C2,) BN2 affine
    :param w2: (C1, C2) conv2 kernel (bias-free, like the reference's
        Conv→BN stacks after bias absorption)
    :returns: ``(out (B, N, C2) f32, (mu1, var1, mu2, var2))`` — the batch
        moments for the caller's running-stat update (biased variance,
        PointBatchNorm convention).

    ``u``/``w`` must be f32 (cast at the call site — the cast's own VJP
    restores the caller's dtype, and it keeps dtype metadata out of the
    custom-vjp residuals).
    """
    out, moments, _ = _fwd(knn_k, alpha, interpret, u, w, xn,
                           gamma1, beta1, w2, gamma2, beta2)
    return out, moments


def _fwd(knn_k, alpha, interpret, u, w, xn, gamma1, beta1, w2, gamma2,
         beta2):
    assert u.dtype == jnp.float32 and w.dtype == jnp.float32, (
        "edgeconv_train takes f32 u/w — cast at the call site"
    )
    bsz, n, c1 = u.shape
    u32 = u
    w32 = w
    xn32 = xn.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    p = bsz * n * knn_k

    idx, s, s2, t, deg = _stats_pallas(u32, w32, xn32, knn_k, interpret)

    sum_g = knn_k * jnp.sum(u32, axis=(0, 1)) + jnp.sum(s, axis=(0, 1))
    sum_g2 = (
        knn_k * jnp.sum(u32 * u32, axis=(0, 1))
        + 2.0 * jnp.sum(u32 * s, axis=(0, 1))
        + jnp.sum(s2, axis=(0, 1))
    )
    mu1 = sum_g / p
    var1 = sum_g2 / p - mu1 * mu1
    sig1 = jnp.sqrt(var1 + EPS)

    ux = (u32 - mu1) / sig1
    wx = w32 / sig1

    ymax, ymin, amax, amin, ysum, ysum2 = _fwd_pallas(
        idx, ux, wx, gamma1, beta1, w2f, alpha, interpret
    )
    mu2 = ysum[0, 0] / p
    var2 = ysum2[0, 0] / p - mu2 * mu2
    sig2 = jnp.sqrt(var2 + EPS)

    pos = gamma2 >= 0
    y_sel = jnp.where(pos, ymax, ymin)
    a_sel = jnp.where(pos, amax, amin)
    r_sel = gamma2 * (y_sel - mu2) / sig2 + beta2
    out = _leaky(r_sel, alpha)

    moments = (mu1, var1, mu2, var2)
    residuals = (idx, ux, wx, s, t, deg, mu1, sig1, mu2, sig2,
                 gamma1, beta1, w2f, gamma2, beta2, y_sel, a_sel, r_sel,
                 u32, w32, xn)
    return out, moments, residuals


def _fwd_rule(knn_k, alpha, interpret, u, w, xn, gamma1, beta1, w2, gamma2,
              beta2):
    out, moments, residuals = _fwd(knn_k, alpha, interpret, u, w, xn,
                                   gamma1, beta1, w2, gamma2, beta2)
    return (out, moments), residuals


def _bwd_rule(knn_k, alpha, interpret, residuals, cts):
    (idx, ux, wx, s, t, deg, mu1, sig1, mu2, sig2,
     gamma1, beta1, w2f, gamma2, beta2, y_sel, a_sel, r_sel,
     u32, w32, xn) = residuals
    g, _ = cts  # moment outputs feed stop-gradient running-stat updates
    g = g.astype(jnp.float32)
    bsz, n, c1 = ux.shape
    p = bsz * n * knn_k

    lr = jnp.where(r_sel >= 0, 1.0, alpha)
    dr = g * lr  # (B, N, C2) — gradient at the BN2 output, selected pairs
    yhat_sel = (y_sel - mu2) / sig2
    dbeta2 = jnp.sum(dr, axis=(0, 1))
    dgamma2 = jnp.sum(dr * yhat_sel, axis=(0, 1))

    a2 = gamma2 / sig2
    dsel = a2 * dr
    m_bar = dbeta2 / p
    c_bar = dgamma2 / p
    e1 = -a2 * c_bar / sig2
    e0 = -a2 * m_bar + a2 * c_bar * mu2 / sig2

    du_dir, dw_dir, dw2, dg1, db1 = _bwd_pallas(
        idx, ux, wx, gamma1, beta1, w2f, dsel, a_sel, e0, e1,
        alpha, interpret,
    )
    dgamma1 = dg1[0]
    dbeta1 = db1[0]
    a_bar = dbeta1 / p
    b_bar = dgamma1 / p
    a1 = gamma1 / sig1

    # BN1 moment corrections (closed form; see module docstring)
    sumk_xhat = (knn_k * u32 + s - knn_k * mu1) / sig1  # (B, N, C1)
    du = a1 * (du_dir - knn_k * a_bar - b_bar * sumk_xhat)
    degc = deg[:, 0, :, None]  # (B, N, 1)
    sumin_xhat = (t + degc * w32 - degc * mu1) / sig1
    dw = a1 * (dw_dir - degc * a_bar - b_bar * sumin_xhat)

    return (du, dw, jnp.zeros_like(xn),  # kNN graph carries no gradient
            dgamma1, dbeta1, dw2, dgamma2, dbeta2)


edgeconv_train.defvjp(_fwd_rule, _bwd_rule)
