"""Feature-learning attention layers.

Reference: models/attention.py — ``Neighbor2PointAttention`` (:130-250) and
``Point2PointAttention`` (:253-355).  The reference's ``L2Attention``
(:7-127) is unusable as shipped (its ``__init__`` calls
``super(Neighbor2PointAttention, self)`` inside its own class body) and is
otherwise byte-identical to Neighbor2PointAttention; it is deliberately not
reproduced.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.nn.common import Conv1x1, PointBatchNorm, leaky_relu, split_heads, merge_heads


class Neighbor2PointAttention(nn.Module):
    """Per-point attention over the K kNN neighbors, with residual + FFN.

    Reference: models/attention.py:130-250.  Q comes from the point itself,
    K/V from the grouped neighborhood (group_type 'diff' for scalar_dot).
    """

    k: int
    group_type: str
    num_heads: int
    attention_mode: str  # 'scalar_dot' | 'vector_sub'
    asm: str  # 'dot' | 'dot-sub'
    q_out: int
    k_out: int
    v_out: int
    ff_hidden: int
    ff_out: int
    impl: str = "auto"  # 'auto' | 'pallas' | 'dense' | 'gather'
    train: bool = True
    dtype: Any = jnp.float32

    def _select_impl(self, n: int) -> str:
        """Pick the attention realization (all mathematically identical for
        scalar_dot — see the algebra below).

        Measured on TPU v5e (B=128, N=1024, C=128, K=32):
          * 'gather' — reference-shaped (B,N,K,C) neighbor gathers: ~180 ms
          * 'dense'  — full q·kᵀ MXU matmul + kNN mask + attn·V: ~52 ms
          * 'pallas' — fused row-tile kernel, nothing O(N²) in HBM
        scalar_dot reduces to ±q_i·k_j plus row constants softmax cancels:
          diff:    q_i·(k_j−k_i)   = q_i·k_j − c_i
          dot-sub: q_i·(q_i−k_j~)  = c_i − (±q_i·k_j)
        and Σ_j a_ij (v_j − v_i) = (Σ_j a_ij v_j) − v_i since Σ_j a_ij = 1.
        """
        if self.impl != "auto":
            return self.impl
        if self.attention_mode != "scalar_dot":
            return "gather"
        from samble_tpu import kernels

        if n >= 256 and self.k <= 128:
            if kernels.use_pallas():
                return "pallas"
            try:
                # SAMBLE_DISABLE_PALLAS=1 etc: the dense-masked MXU rewrite
                # still beats gathers on TPU (52 vs 180 ms at N=1024), but
                # it materializes (B, H, N, N) f32 — cap N so the fallback
                # cannot OOM where the gather path would run (4096-pt cfg)
                if jax.default_backend() == "tpu" and n <= 2048:
                    return "dense"
            except Exception:
                pass
        return "gather"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, N, C)
        # Project-then-gather: the 1×1 q/k/v convs are linear (bias-free), so
        # conv(gather(x)) == gather(conv(x)) and conv(nb − center) ==
        # gather(conv(x)) − conv(x).  This turns the reference's matmul over
        # the (B, N, K, C) grouped tensor (models/attention.py:175-181 —
        # K times the FLOPs) into a per-point matmul plus a gather.  Exact.
        n = x.shape[1]
        x_raw = x
        x = x.astype(self.dtype)
        q = split_heads(Conv1x1(self.q_out, dtype=self.dtype)(x), self.num_heads)
        k_pt = Conv1x1(self.k_out, dtype=self.dtype)(x)  # (B, N, C)
        v_pt = Conv1x1(self.v_out, dtype=self.dtype)(x)

        d = q.shape[-1]
        scale = 1.0 / math.sqrt(d)
        if self.group_type not in ("diff", "neighbor"):
            raise ValueError(
                f"N2P group_type must be diff or neighbor, got {self.group_type}"
            )
        impl = self._select_impl(n)
        if self.attention_mode == "scalar_dot" and impl in ("pallas", "dense"):
            if self.asm not in ("dot", "dot-sub"):
                raise ValueError(f"asm must be dot or dot-sub, got {self.asm}")
            negate = self.asm == "dot-sub"
            subtract_v = self.group_type == "diff"
            if impl == "pallas":
                # kNN selection fused INTO the attention kernel: no index
                # pass, no mask rebuild (kernels/n2p.py docstring)
                from samble_tpu import kernels
                from samble_tpu.kernels.n2p import n2p_attention_fused

                out = n2p_attention_fused(
                    merge_heads(q), k_pt, v_pt,
                    ops.neighbors.knn_normalized(x_raw),
                    self.num_heads, scale, negate, subtract_v, self.k,
                    kernels.interpret_default(),
                )
            else:
                from samble_tpu.kernels.n2p import n2p_dense_reference

                idx = ops.neighbors.knn_indices(x_raw, self.k)  # (B, N, K)
                out = n2p_dense_reference(
                    merge_heads(q), k_pt, v_pt, idx,
                    self.num_heads, scale, negate, subtract_v,
                )
            return self._res_ffn(x, out.astype(self.dtype))

        idx = ops.neighbors.knn_indices(x_raw, self.k)  # (B, N, K)
        k_nb = ops.index_points(k_pt, idx)  # (B, N, K, C)
        v_nb = ops.index_points(v_pt, idx)
        if self.group_type == "diff":
            k_nb = k_nb - k_pt[:, :, None]
            v_nb = v_nb - v_pt[:, :, None]
        kk = split_heads(k_nb, self.num_heads)  # (B, N, K, H, D)
        v = split_heads(v_nb, self.num_heads)

        if self.attention_mode == "scalar_dot":
            if self.asm == "dot":
                energy = jnp.einsum("bnhd,bnkhd->bnhk", q, kk)
            elif self.asm == "dot-sub":
                # Q·(Q−K) (models/attention.py:240-241)
                energy = jnp.einsum("bnhd,bnkhd->bnhk", q, q[:, :, None] - kk)
            else:
                raise ValueError(f"asm must be dot or dot-sub, got {self.asm}")
            attn = jax.nn.softmax(energy * scale, axis=-1)  # (B, N, H, K)
            out = jnp.einsum("bnhk,bnkhd->bnhd", attn, v)
        elif self.attention_mode == "vector_sub":
            energy = q[:, :, None] - kk  # (B, N, K, H, D)
            # softmax over the *channel* axis (reference quirk,
            # models/attention.py:219-220: softmax(dim=-1) on (...,K,D))
            attn = jax.nn.softmax(energy * scale, axis=-1)
            out = jnp.sum(attn * v, axis=2)  # (B, N, H, D)
        else:
            raise ValueError(
                f"attention_mode must be scalar_dot or vector_sub, got {self.attention_mode}"
            )

        out = merge_heads(out)  # (B, N, v_out)
        return self._res_ffn(x, out)

    def _res_ffn(self, x: jax.Array, out: jax.Array) -> jax.Array:
        """Residual + BN + conv-FFN tail (models/attention.py:185-192)."""
        x = PointBatchNorm(
            use_running_average=not self.train, dtype=self.dtype
        )(x + out)
        ff = Conv1x1(self.ff_hidden, dtype=self.dtype)(x)
        ff = leaky_relu(ff)
        ff = Conv1x1(self.ff_out, dtype=self.dtype)(ff)
        return PointBatchNorm(
            use_running_average=not self.train, dtype=self.dtype
        )(x + ff)


class Point2PointAttention(nn.Module):
    """Full global N×N self-attention with residual + FFN.

    Reference: models/attention.py:253-355.
    """

    num_heads: int
    asm: str  # 'dot' | 'l2' | 'l2+'
    q_out: int
    k_out: int
    v_out: int
    ff_hidden: int
    ff_out: int
    impl: str = "auto"  # 'auto' | 'pallas' | 'dense'
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, N, C)
        n = x.shape[1]
        x = x.astype(self.dtype)
        q_f = Conv1x1(self.q_out, dtype=self.dtype)(x)
        k_f = Conv1x1(self.k_out, dtype=self.dtype)(x)
        v_f = Conv1x1(self.v_out, dtype=self.dtype)(x)
        scale = 1.0 / math.sqrt(self.q_out // self.num_heads)

        from samble_tpu import kernels

        use_tiled = self.impl == "pallas" or (
            self.impl == "auto" and kernels.use_pallas() and n >= 256
        )
        if use_tiled:
            # row-streamed kernel: the (B, H, N, N) map never exists in
            # HBM, which is what makes the p2p / l2 variants memory-safe
            # at the 4096-pt config (kernels/p2p.py; custom VJP inside)
            from samble_tpu.kernels.p2p import p2p_attention

            out = p2p_attention(
                q_f, k_f, v_f, self.num_heads, float(scale), self.asm,
                kernels.interpret_default(),
            ).astype(self.dtype)
            return self._tail(x, out)

        q = split_heads(q_f, self.num_heads)
        kk = split_heads(k_f, self.num_heads)
        v = split_heads(v_f, self.num_heads)

        qh = jnp.swapaxes(q, 1, 2)  # (B, H, N, D)
        kh = jnp.swapaxes(kk, 1, 2)
        if self.asm == "dot":
            energy = jnp.einsum("bhnd,bhmd->bhnm", qh, kh)
        elif self.asm == "l2":
            energy = -ops.l2_global(qh, kh)
        elif self.asm == "l2+":
            energy = ops.l2_global(qh, kh)
        else:
            raise ValueError(f"asm must be dot, l2 or l2+, got {self.asm}")
        attn = jax.nn.softmax(energy * scale, axis=-1)  # (B, H, N, N)
        out = jnp.einsum("bhnm,bhmd->bnhd", attn, jnp.swapaxes(v, 1, 2))
        out = merge_heads(out)
        return self._tail(x, out)

    def _tail(self, x: jax.Array, out: jax.Array) -> jax.Array:
        """Residual + BN + conv-FFN tail (models/attention.py:185-192)."""
        x = PointBatchNorm(
            use_running_average=not self.train, dtype=self.dtype
        )(x + out)
        ff = Conv1x1(self.ff_hidden, dtype=self.dtype)(x)
        ff = leaky_relu(ff)
        ff = Conv1x1(self.ff_out, dtype=self.dtype)(ff)
        return PointBatchNorm(
            use_running_average=not self.train, dtype=self.dtype
        )(x + ff)
