"""Attention-map primitives.

Reference parity targets:
  * ``l2_global``  — utils/ops.py:115-122
  * ``norm_range`` — utils/ops.py:148-171
  * attention score reductions (col_sum / sparse_*) — models/downsample.py:309-344
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_global(q: jax.Array, k: jax.Array) -> jax.Array:
    """Pairwise squared-L2 energy ‖q_i − k_j‖².

    :param q: (B, H, N, D)
    :param k: (B, H, M, D)   (note: channels-last; the reference takes k as
        (B, H, D, M), utils/ops.py:115)
    :returns: (B, H, N, M)
    """
    inner = jnp.einsum(
        "bhnd,bhmd->bhnm",
        q,
        k,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    qq = jnp.sum(q * q, axis=-1, keepdims=True)  # (B, H, N, 1)
    kk = jnp.sum(k * k, axis=-1, keepdims=True)  # (B, H, M, 1)
    return qq - 2.0 * inner + jnp.swapaxes(kk, -1, -2)


def zscore(x: jax.Array, axis: int = -1) -> jax.Array:
    """(x − mean) / std with the biased (population) std, matching
    ``torch.std(..., unbiased=False)`` in utils/ops.py:451-452."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    return (x - mean) / std


def norm_range(
    x: jax.Array,
    axis: int = -1,
    n_min: float = 0.0,
    n_max: float = 1.0,
    mode: str = "minmax",
) -> jax.Array:
    """Range normalization with the reference's four modes (utils/ops.py:148-171).

    'z-score' ignores n_max and adds n_min as an offset (quirk preserved).
    """
    if mode == "minmax":
        x_min = jnp.min(x, axis=axis, keepdims=True)
        x_max = jnp.max(x, axis=axis, keepdims=True)
        x_norm = (x - x_min) / (x_max - x_min + 1e-8)
    elif mode == "sigmoid":
        x_norm = jax.nn.sigmoid(x)
    elif mode == "tanh":
        x_norm = (jnp.tanh(x) + 1.0) / 2.0
    elif mode == "z-score":
        return zscore(x, axis=axis) + n_min
    else:
        raise ValueError(
            f"norm_range mode should be minmax, sigmoid, tanh or z-score, got {mode}"
        )
    return x_norm * (n_max - n_min) + n_min


def attention_point_score(
    attention_points: jax.Array,
    mask: jax.Array,
    idx_mode: str,
    k: int,
) -> jax.Array:
    """Per-point importance score from a (sparse-masked) attention map.

    :param attention_points: (B, H, N, N) softmaxed attention over points
    :param mask: (B, N, N) 0/1 kNN adjacency (broadcast over heads)
    :param idx_mode: one of col_sum, row_std, sparse_row_sum, sparse_row_std,
        sparse_col_sum, sparse_col_avg, sparse_col_sqr, sparse_col_sum_sqr
    :param k: kNN degree (rows of the mask each have k ones)
    :returns: (B, H, N) scores, NaNs scrubbed to 0

    Reference: models/downsample.py:309-344 (DownSampleToken), :605-637
    (DownSampleCarve), :1373-1405 (DownSampleGlobal, which adds
    sparse_col_sum_sqr).  Gradients never flow through the score (it only
    feeds bin masks and integer index selection), so callers may wrap this in
    ``stop_gradient`` — which is what makes the fused Pallas forward-only
    kernel legal.
    """
    m = mask[:, None, :, :]  # (B, 1, N, N)
    sparse = attention_points * m
    sparse_num = jnp.sum(m, axis=-2) + 1e-8  # (B, 1, N) column degrees

    if idx_mode == "col_sum":
        score = jnp.sum(attention_points, axis=-2)
    elif idx_mode == "row_std":
        # torch.std(dim=-1) unbiased by default (models/downsample.py:320)
        score = jnp.std(attention_points, axis=-1, ddof=1)
    elif idx_mode == "sparse_row_sum":
        score = jnp.sum(sparse, axis=-1)
    elif idx_mode == "sparse_row_std":
        # std over the K nonzero entries of each row (masked_select view,
        # models/downsample.py:327-330).  Rows have exactly k ones.
        s = jnp.sum(sparse, axis=-1)
        ss = jnp.sum(sparse * sparse, axis=-1)
        mean = s / k
        var = (ss - k * mean * mean) / (k - 1)
        score = jnp.sqrt(jnp.maximum(var, 0.0))
    elif idx_mode == "sparse_col_sum":
        score = jnp.sum(sparse, axis=-2)
    elif idx_mode == "sparse_col_avg":
        score = jnp.sum(sparse, axis=-2) / sparse_num
    elif idx_mode == "sparse_col_sqr":
        score = jnp.sum(sparse, axis=-2) / sparse_num / sparse_num
    elif idx_mode == "sparse_col_sum_sqr":
        col_sum = jnp.sum(sparse, axis=-2)
        score = 0.5 * col_sum / sparse_num / sparse_num + 0.5 * col_sum
    else:
        raise ValueError(f"Unknown idx_mode: {idx_mode}")

    return jnp.nan_to_num(score, nan=0.0, posinf=0.0, neginf=0.0)
