"""Point embedding modules: EdgeConv and the STN input transform.

Reference: models/embedding.py:7-39 (EdgeConv), :42-97 (STN).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.nn.common import Conv1x1, ConvBNLeaky, PointBatchNorm, leaky_relu


class EdgeConv(nn.Module):
    """DGCNN-style edge convolution.

    kNN-group the input (``group_type`` decides center/diff concatenation),
    apply two Conv1x1+BN+LeakyReLU stages on each (point, neighbor) pair,
    then max-pool over the K neighbors.

    Reference: models/embedding.py:7-39.
    """

    k: int
    group_type: str
    conv1_out: int
    conv2_out: int
    normal_channel: bool = False
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, N, C)
        # conv1 is linear (bias-free), so it commutes with the grouping:
        # conv1([center ‖ nb − center]) = (W_c − W_d)·x  +  gather(W_d·x).
        # The kernel keeps the reference's (C', conv1_out) shape; only the
        # matmul is hoisted before the gather (exact — see nn/attention.py).
        b, n, c = x.shape
        c_in = 2 * c if self.group_type.startswith("center") else c
        kernel = self.param(
            "conv1_kernel",
            nn.initializers.lecun_normal(),
            (c_in, self.conv1_out),
        ).astype(self.dtype)
        if self.normal_channel and c == 6:
            idx = ops.neighbors.knn_indices(x[..., :3], self.k)
        else:
            idx = ops.neighbors.knn_indices(x, self.k)
        x = x.astype(self.dtype)

        if self.group_type == "center_diff":
            w_center, w_diff = kernel[:c], kernel[c:]
            p_self = x @ (w_center - w_diff)  # (B, N, C1)
            p_nb = x @ w_diff
            g = p_self[:, :, None] + ops.index_points(p_nb, idx)
        elif self.group_type == "center_neighbor":
            w_center, w_nb = kernel[:c], kernel[c:]
            p_self = x @ w_center
            p_nb = x @ w_nb
            g = p_self[:, :, None] + ops.index_points(p_nb, idx)
        elif self.group_type == "diff":
            p = x @ kernel
            g = ops.index_points(p, idx) - p[:, :, None]
        elif self.group_type == "neighbor":
            p = x @ kernel
            g = ops.index_points(p, idx)
        else:
            raise ValueError(f"unknown group_type: {self.group_type}")
        # g: (B, N, K, conv1_out)
        g = PointBatchNorm(use_running_average=not self.train, dtype=self.dtype)(g)
        g = leaky_relu(g)
        g = ConvBNLeaky(self.conv2_out, train=self.train, dtype=self.dtype)(g)
        return jnp.max(g, axis=2)  # (B, N, conv2_out)


class STN(nn.Module):
    """Spatial transformer predicting a 3×3 input alignment matrix.

    Operates on a center_diff kNN grouping of the raw xyz (so input channel
    count is 6).  The final linear layer is zero-weight / identity-bias
    initialized so training starts from the identity transform.

    Reference: models/embedding.py:42-97; applied in models/seg_model.py:181-190.
    """

    train: bool = True

    @nn.compact
    def __call__(self, x_grouped: jax.Array) -> jax.Array:
        # x_grouped: (B, N, K, 6)
        b = x_grouped.shape[0]
        x = ConvBNLeaky(64, train=self.train)(x_grouped)
        x = ConvBNLeaky(128, train=self.train)(x)
        x = jnp.max(x, axis=2)  # (B, N, 128)
        x = ConvBNLeaky(1024, train=self.train)(x)
        x = jnp.max(x, axis=1)  # (B, 1024)
        x = Conv1x1(512)(x)
        x = PointBatchNorm(use_running_average=not self.train)(x)
        x = leaky_relu(x)
        x = nn.Dropout(0.5, deterministic=not self.train)(x)
        x = Conv1x1(256)(x)
        x = PointBatchNorm(use_running_average=not self.train)(x)
        x = leaky_relu(x)
        x = nn.Dropout(0.5, deterministic=not self.train)(x)
        x = nn.Dense(
            9,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.eye(
                3, dtype=dtype
            ).reshape(shape),
        )(x)
        return x.reshape(b, 3, 3)
