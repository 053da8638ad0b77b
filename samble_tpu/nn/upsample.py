"""Decoder upsampling modules for the segmentation U-Net.

Reference: models/upsample.py — ``UpSample`` (crossA, :8-65),
``UpSampleSelfAttention`` (selfA, :68-133), ``UpSampleInterpolation``
(:136-213, the shipped seg path per configs/seg.yaml:124-127).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.nn.common import Conv1x1, PointBatchNorm, leaky_relu, split_heads, merge_heads


class UpSampleCrossAttention(nn.Module):
    """'crossA': cross-attention from the high-res skip (Q) to the
    downsampled set (K/V), plus a 1×1-conv skip link.

    Reference: models/upsample.py:8-65.  Quirk preserved: the softmax scale
    is √D taken from ``q.shape[-2]`` of the (B,H,D,M1) layout — i.e. still
    the head depth.
    """

    num_heads: int
    q_out: int
    k_out: int
    v_out: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pcd_up: jax.Array,  # (B, N, C) high-res features
        points_select: jax.Array,  # (B, M, C) downsampled features
        **_,
    ) -> jax.Array:
        pcd_up = pcd_up.astype(self.dtype)
        points_select = points_select.astype(self.dtype)
        q = split_heads(Conv1x1(self.q_out, dtype=self.dtype)(pcd_up), self.num_heads)
        k = split_heads(
            Conv1x1(self.k_out, dtype=self.dtype)(points_select), self.num_heads
        )
        v = split_heads(
            Conv1x1(self.v_out, dtype=self.dtype)(points_select), self.num_heads
        )
        scale = 1.0 / math.sqrt(q.shape[-1])
        energy = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        attn = jax.nn.softmax(energy.astype(jnp.float32) * scale, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), v)
        out = merge_heads(out)
        return Conv1x1(self.v_out, dtype=self.dtype)(pcd_up) + out


class UpSampleSelfAttention(nn.Module):
    """'selfA': scatter kept + dropped features back to N positions, run
    full self-attention, add the skip-link.

    Reference: models/upsample.py:68-133.
    """

    num_heads: int
    q_out: int
    k_out: int
    v_out: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pcd_up: jax.Array,  # (B, N, C)
        points_select: jax.Array,  # (B, M, C)
        idx_select: jax.Array = None,  # (B, M)
        points_drop: jax.Array = None,  # (B, N - M, C)
        idx_drop: jax.Array = None,  # (B, N - M)
        **_,
    ) -> jax.Array:
        pcd_up = pcd_up.astype(self.dtype)
        points_select = points_select.astype(self.dtype)
        points_drop = points_drop.astype(self.dtype)
        # concat_by_idx (models/upsample.py:129-133): scatter both sets back
        # to their original positions.
        src = jnp.concatenate([points_select, points_drop], axis=1)
        idx = jnp.concatenate([idx_select, idx_drop], axis=1)
        x = jax.vmap(lambda s, i: jnp.zeros_like(s).at[i].set(s))(src, idx)

        q = split_heads(Conv1x1(self.q_out, dtype=self.dtype)(x), self.num_heads)
        k = split_heads(Conv1x1(self.k_out, dtype=self.dtype)(x), self.num_heads)
        v = split_heads(Conv1x1(self.v_out, dtype=self.dtype)(x), self.num_heads)
        scale = 1.0 / math.sqrt(q.shape[-1])
        energy = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        attn = jax.nn.softmax(energy.astype(jnp.float32) * scale, axis=-1)
        out = merge_heads(
            jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), v)
        )
        return Conv1x1(self.v_out, dtype=self.dtype)(pcd_up) + out


class UpSampleInterpolation(nn.Module):
    """PointNet++-style 3-NN inverse-distance interpolation upsample.

    Reference: models/upsample.py:136-213.  Shipped seg config uses
    ``distance_type: xyz`` with K=3 (configs/seg.yaml:124-127).
    """

    v_out: int
    distance_type: str = "xyz"  # 'feature' | 'xyz'
    k: int = 3
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pcd_up: jax.Array,  # (B, N, C)
        points_select: jax.Array,  # (B, M, C)
        pcd_up_xyz: jax.Array = None,  # (B, N, 3)
        points_select_xyz: jax.Array = None,  # (B, M, 3)
        **_,
    ) -> jax.Array:
        sel_conv = Conv1x1(self.v_out, dtype=self.dtype)(
            points_select.astype(self.dtype)
        )
        sel_conv = PointBatchNorm(
            use_running_average=not self.train, dtype=self.dtype
        )(sel_conv)
        sel_conv = leaky_relu(sel_conv)  # (B, M, v_out)

        if self.distance_type == "feature":
            # feature distances carry parameter gradients through the 1/d
            # interpolation weights — training needs the differentiable kNN
            neighbors, _, d = ops.select_neighbors_interpolate(
                pcd_up, points_select, sel_conv, k=self.k,
                differentiable=self.train,
            )
        elif self.distance_type == "xyz":
            # xyz positions reach here through integer gathers of the INPUT
            # coordinates only — no parameter ever influences d, so the
            # fused forward-only kNN is exact for training too (gradients
            # through d are identically zero either way)
            neighbors, _, d = ops.select_neighbors_interpolate(
                pcd_up_xyz, points_select_xyz, sel_conv, k=self.k,
                differentiable=False,
            )
        else:
            raise ValueError(
                f"distance_type must be feature or xyz, got {self.distance_type}"
            )
        # neighbors: (B, N, K, v_out); d: (B, N, K) positive distances
        w = 1.0 / (d + 1e-8)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        interp = jnp.sum(neighbors * w[..., None], axis=2)  # (B, N, v_out)

        x = jnp.concatenate(
            [pcd_up.astype(self.dtype), interp.astype(self.dtype)], axis=-1
        )
        x = Conv1x1(self.v_out, dtype=self.dtype)(x)
        x = PointBatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        return leaky_relu(x)
