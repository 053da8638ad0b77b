"""Fused selected-row attention output: softmax(q_sel·kᵀ·scale) @ v.

The DownSampleToken fused path recomputes the M selected attention rows in
XLA (nn/downsample.py): an (B, M, N+nb) f32 energy einsum, a softmax, a
bf16 cast, and the @V einsum — ~4.5 ms of HBM round-trips per layer at the
primary shapes (tools/probe_ds_token.py).  At these sizes the whole row
block fits in VMEM, so one kernel cell computes energy → softmax → @V with
nothing O(M·N) ever reaching HBM.

``attn_rows_pallas`` is the forward-only eval entry; ``attn_rows`` adds a
flash-style custom VJP (softmax recomputed per row tile in the backward,
dk/dv streamed across tiles) so the TRAIN path gets the same
no-O(M·NT)-in-HBM property — including in the autodiff residuals, where
the XLA recompute used to save the full f32 map.  Reference semantics:
models/downsample.py:242-252 (gather attention rows, multiply by V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ENERGY_ASM = {"dot": (1.0, 0.0), "l2": (2.0, -1.0), "l2+": (-2.0, 1.0)}


def _attn_rows_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                      nt_valid: int, energy_asm: str = "dot"):
    """One (batch, row-tile) cell.

    q_ref: (1, TILE, D) selected query rows
    k_ref: (1, NTP, D) keys (point + bin-token columns, padded)
    v_ref: (1, NTP, C) values (padded rows are zero)
    out_ref: (1, TILE, C)
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    tile, ntp = q.shape[0], k.shape[0]

    coef, sgn = _ENERGY_ASM[energy_asm]
    energy = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, NTP)
    if sgn != 0.0:  # l2 energies: column bias from the resident keys
        # (softmax drops the per-row ||q||^2 term; padded key rows are
        # zero so their bias is 0 and the -inf mask below handles them)
        kb = sgn * jnp.sum(k.astype(jnp.float32) ** 2, axis=1)
        energy = coef * energy + kb[None, :]
    energy = energy * scale
    if nt_valid < ntp:
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, ntp), 1)
        energy = jnp.where(col < nt_valid, energy, -jnp.inf)
    row_max = jnp.max(energy, axis=1, keepdims=True)
    ex = jnp.exp(energy - row_max)
    attn = (ex / jnp.sum(ex, axis=1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        attn, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                              "energy_asm"))
def attn_rows_pallas(q_sel, k, v, scale: float, interpret: bool = False,
                     energy_asm: str = "dot"):
    """softmax(q_sel · kᵀ · scale, axis=-1) @ v without the HBM row block.

    :param q_sel: (B, M, D) selected query rows
    :param k: (B, NT, D) keys;  v: (B, NT, C) values
    :returns: (B, M, C) in ``v.dtype``
    """
    bsz, m, d = q_sel.shape
    nt = k.shape[1]
    c = v.shape[-1]
    tile = 128 if m % 128 == 0 else (64 if m % 64 == 0 else m)
    nt_pad = _round_up(nt, 128)
    if nt_pad != nt:
        k = jnp.pad(k, ((0, 0), (0, nt_pad - nt), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nt_pad - nt), (0, 0)))

    grid = (bsz, m // tile)
    kernel = functools.partial(_attn_rows_kernel, scale=scale, nt_valid=nt,
                               energy_asm=energy_asm)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, c), v.dtype),
        interpret=interpret,
    )(q_sel, k, v)
    return out


_attn_rows_fwd_impl = attn_rows_pallas  # unwrapped fwd (used by the VJP)


def _attn_rows_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                          *, scale: float, nt_valid: int,
                          energy_asm: str = "dot"):
    """Flash-style backward cell: softmax recomputed per row tile, nothing
    O(M·NT) in HBM.  dk/dv accumulate across the sequential row-tile axis.

    With a = softmax(q·kᵀ·s):  dv = aᵀ g;  da = g·vᵀ;
    de = a ⊙ (da − Σ_cols(a ⊙ da));  dq = s·de·k;  dk = s·deᵀ·q.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    tile, ntp = q.shape[0], k.shape[0]

    coef, sgn = _ENERGY_ASM[energy_asm]
    energy = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if sgn != 0.0:
        kb = sgn * jnp.sum(k.astype(jnp.float32) ** 2, axis=1)
        energy = coef * energy + kb[None, :]
    energy = energy * scale
    if nt_valid < ntp:
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, ntp), 1)
        energy = jnp.where(col < nt_valid, energy, -jnp.inf)
    row_max = jnp.max(energy, axis=1, keepdims=True)
    ex = jnp.exp(energy - row_max)
    a = ex / jnp.sum(ex, axis=1, keepdims=True)  # (TILE, NTP) f32
    # the forward casts attn to v.dtype before @V — mirror that exactly so
    # the gradient matches the (bf16-quantized) forward computation
    a_q = a.astype(v.dtype).astype(jnp.float32)

    da = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, NTP)
    # softmax VJP uses the f32 softmax output; the bf16 quantization cast
    # has an identity gradient (dv below is where the quantized a appears)
    t = jnp.sum(a * da, axis=1, keepdims=True)
    dz = a * (da - t)  # gradient wrt the scaled logits / scale
    de = (dz * (scale * coef)).astype(q.dtype)  # (TILE, NTP)

    dq = jax.lax.dot_general(
        de, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_acc = jax.lax.dot_general(
        de, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if sgn != 0.0:  # column-bias path: d(s*||k||^2)/dk = 2s*k per column
        col = jnp.sum(dz, axis=0) * (2.0 * sgn * scale)  # (NTP,)
        dk_acc = dk_acc + col[:, None] * k.astype(jnp.float32)
    dk_ref[0] += dk_acc.astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        a_q.astype(g_ref.dtype), g_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                              "energy_asm"))
def _attn_rows_pallas_bwd(q_sel, k, v, g, scale: float,
                          interpret: bool = False,
                          energy_asm: str = "dot"):
    bsz, m, d = q_sel.shape
    nt = k.shape[1]
    c = v.shape[-1]
    tile = 128 if m % 128 == 0 else (64 if m % 64 == 0 else m)
    nt_pad = _round_up(nt, 128)
    if nt_pad != nt:
        k = jnp.pad(k, ((0, 0), (0, nt_pad - nt), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nt_pad - nt), (0, 0)))

    grid = (bsz, m // tile)
    kernel = functools.partial(_attn_rows_bwd_kernel, scale=scale,
                               nt_valid=nt, energy_asm=energy_asm)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, m, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nt_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nt_pad, c), jnp.float32),
        ],
        interpret=interpret,
    )(q_sel, k, v, g)
    return dq, dk[:, :nt], dv[:, :nt]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attn_rows(q_sel, k, v, scale: float, interpret: bool = False,
              energy_asm: str = "dot"):
    """Differentiable fused row attention (the TRAIN path's x_ds).

    Same math as :func:`attn_rows_pallas`, plus a flash-style custom VJP:
    the (B, M, NT) attention map exists neither in the forward nor in the
    autodiff residuals — the backward kernel recomputes the softmax per
    row tile from (q, k) and streams dk/dv accumulation across tiles.
    Replaces the XLA recompute in nn/downsample.py that materialized the
    f32 map and saved it for the backward pass.
    """
    return _attn_rows_fwd_impl(q_sel, k, v, scale, interpret, energy_asm)


def _attn_rows_vjp_fwd(q_sel, k, v, scale, interpret, energy_asm):
    return (_attn_rows_fwd_impl(q_sel, k, v, scale, interpret, energy_asm),
            (q_sel, k, v))


def _attn_rows_vjp_bwd(scale, interpret, energy_asm, res, g):
    q_sel, k, v = res
    dq, dk, dv = _attn_rows_pallas_bwd(q_sel, k, v, g, scale, interpret,
                                       energy_asm)
    return dq.astype(q_sel.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


attn_rows.defvjp(_attn_rows_vjp_fwd, _attn_rows_vjp_bwd)


# ---------------------------------------------------------------------------
# SPMD dispatch: batch-shard over the ambient mesh (kernels/spmd.py).
# pallas_call has no GSPMD rule — unwrapped, a >1-device mesh would
# all-gather every operand and run the kernel replicated on each device.
# ---------------------------------------------------------------------------
from samble_tpu.kernels import spmd as _spmd  # noqa: E402

attn_rows_pallas = _spmd.data_parallel(attn_rows_pallas, 3)
attn_rows = _spmd.data_parallel(attn_rows, 3)
