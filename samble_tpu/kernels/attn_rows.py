"""Fused selected-row attention output: softmax(q_sel·kᵀ·scale) @ v.

The DownSampleToken fused path recomputes the M selected attention rows in
XLA (nn/downsample.py): an (B, M, N+nb) f32 energy einsum, a softmax, a
bf16 cast, and the @V einsum — ~4.5 ms of HBM round-trips per layer at the
primary shapes (tools/probe_ds_token.py).  At these sizes the whole row
block fits in VMEM, so one kernel cell computes energy → softmax → @V with
nothing O(M·N) ever reaching HBM.

Forward-only: the eval path dispatches here; training keeps the
differentiable XLA recompute (the module needs grads through q/k/v
projections).  Reference semantics: models/downsample.py:242-252 (gather
attention rows, multiply by V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_rows_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                      nt_valid: int):
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

    energy = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TILE, NTP)
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


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def attn_rows_pallas(q_sel, k, v, scale: float, interpret: bool = False):
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
    kernel = functools.partial(_attn_rows_kernel, scale=scale, nt_valid=nt)
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
