"""Shared building blocks: BatchNorm, activations, 1×1 convolutions.

The reference's ``nn.Conv1d/Conv2d(kernel_size=1)`` are plain per-point
linear maps; channels-last they become ``nn.Dense`` — a single MXU matmul
with the (B·N[·K]) axis as rows.  BatchNorm statistics are computed over
every axis except channels, matching ``nn.BatchNorm1d/2d``; under ``jit``
with a batch-sharded mesh the moments are global across devices, which *is*
SyncBatchNorm (reference: ``convert_sync_batchnorm``, train_modelnet.py:245).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array) -> jax.Array:
    """LeakyReLU(negative_slope=0.2), the reference's default activation."""
    return nn.leaky_relu(x, negative_slope=0.2)


class RawBN(nn.Module):
    """Variable-layout twin of ``nn.BatchNorm`` for kernel-computed moments.

    The fused train-mode EdgeConv kernel (kernels/edgeconv_train.py)
    computes the batch moments analytically, so BatchNorm's job splits
    into (a) exposing γ/β and (b) updating the running stats.  This module
    declares the exact same variables as ``nn.BatchNorm`` (names, shapes,
    inits, collection) so that, constructed under ``name="BatchNorm_0"``,
    it aliases the standard path's tree — checkpoints and the eval/gather
    paths interchange freely.
    """

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, update_moments=None):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if update_moments is not None and not self.is_initializing():
            m, v = update_moments
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * m
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * v
            )
        return scale, bias, ra_mean.value, ra_var.value


class PointBatchNorm(nn.Module):
    """BatchNorm over all non-channel axes (torch BN1d/BN2d semantics).

    Torch parity: momentum 0.1 (torch convention; flax uses 1−that),
    eps 1e-5, affine.  Running statistics live in the ``batch_stats``
    collection.  Deviation (documented): normalization uses the biased batch
    variance both for the forward pass and the running estimate, whereas
    torch stores the unbiased variance in the running buffer; the effect is
    O(1/(B·N)) on eval outputs.

    Mixed precision: moments and running stats are always f32 (inputs are
    upcast); the output is cast to ``dtype`` (the reference's AMP autocast
    similarly keeps BN in f32, train_modelnet.py:324-343).
    """

    use_running_average: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array = None, *, raw_features: int = None,
                 update_moments=None):
        if raw_features is not None:
            # kernel path: hand back γ/β (and update running stats when
            # given kernel-computed batch moments) — same variable tree as
            # the nn.BatchNorm below (see RawBN)
            return RawBN(features=raw_features, name="BatchNorm_0")(
                update_moments
            )
        y = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class Conv1x1(nn.Module):
    """1×1 convolution == Dense over the channel (last) axis.

    ``dtype`` is the computation dtype (bf16 under AMP); params stay f32.
    """

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            self.features, use_bias=self.use_bias,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


class ConvBNLeaky(nn.Module):
    """Conv1x1 → BatchNorm → LeakyReLU(0.2) block (the reference's
    ``nn.Sequential(Conv, BN, LeakyReLU)`` pattern).

    ``part`` lets a caller split the block around a gather: the conv is
    linear and bias-free, so it commutes with neighbor grouping — apply
    ``part='conv'`` per-point before the gather and ``part='bnleaky'`` on
    the assembled pair tensor (STN's train path, nn/embedding.py).  Both
    submodules are constructed unconditionally so the parameter tree (and
    checkpoint layout) is identical however the block is called."""

    features: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array = None, part: str = "all", *,
                 in_features: int = None, update_moments=None):
        if part == "raw_conv":
            # exact f32 conv kernel for the fused train path, recovered by
            # an identity probe (the Dense is bias-free and linear, so the
            # probe IS the kernel; grads flow through the probe matmul).
            # Explicit names alias the standard path's auto-named children.
            conv = Conv1x1(self.features, dtype=jnp.float32,
                           name="Conv1x1_0")
            return conv(jnp.eye(in_features, dtype=jnp.float32)[None])[0]
        if part == "raw_bn":
            bn = PointBatchNorm(
                use_running_average=not self.train, dtype=self.dtype,
                name="PointBatchNorm_0",
            )
            return bn(raw_features=self.features,
                      update_moments=update_moments)
        conv = Conv1x1(self.features, dtype=self.dtype, name="Conv1x1_0")
        bn = PointBatchNorm(use_running_average=not self.train,
                            dtype=self.dtype, name="PointBatchNorm_0")
        if part in ("all", "conv"):
            x = conv(x)
        if part in ("all", "bnleaky"):
            x = bn(x)
            x = leaky_relu(x)
        return x


def bn_leaky_pool(
    raw_bn,
    z: jax.Array,
    axis: int,
    *,
    train: bool,
    mean_pool: bool = False,
    out_dtype: Any = None,
):
    """``pool(leaky(BN(z)))`` over ``axis`` without the normalized slab.

    BatchNorm is a per-channel affine ``z·s + b`` and LeakyReLU is strictly
    increasing, so the max over the pooled axis commutes with both:
    ``max leaky(s·z + b) = leaky(s·(max z if s>0 else min z) + b)``.  The
    (…, pooled, C) normalized/activated tensors therefore never exist —
    XLA reduces ``z`` directly (moments, max, min fuse into one read) and
    autodiff has no slab-sized residuals to save.  Exact vs the composed
    chain up to float association (same moments formula as flax BatchNorm:
    biased variance, eps 1e-5 inside rsqrt).

    :param raw_bn: ``callable(update_moments=None) -> (scale, bias,
        ra_mean, ra_var)`` — the RawBN accessor of a PointBatchNorm /
        ConvBNLeaky (``raw_features`` / ``part='raw_bn'``), which aliases
        the standard path's variable tree (checkpoints interchange).
    :param z: pre-BatchNorm tensor, channels last.
    :param axis: the axis to pool away (e.g. points or neighbors).
    :param mean_pool: additionally return the mean of ``leaky(BN(z))``
        over ``axis`` (computed as a fused elementwise+reduce read of
        ``z`` — the mean does not commute through leaky).
    :returns: pooled max, or ``(max, mean)`` when ``mean_pool``.
    """
    z32 = z.astype(jnp.float32)
    if train:
        red = tuple(i for i in range(z.ndim) if i != z.ndim - 1)
        mu = jnp.mean(z32, axis=red)
        var = jnp.mean(jnp.square(z32), axis=red) - jnp.square(mu)
        sg = jax.lax.stop_gradient
        scale, bias, _, _ = raw_bn((sg(mu), sg(var)))
    else:
        scale, bias, mu, var = raw_bn(None)
    s = scale * jax.lax.rsqrt(var + 1e-5)
    b = bias - mu * s
    dtype = out_dtype or z.dtype
    zmax = jnp.max(z32, axis=axis)
    zmin = jnp.min(z32, axis=axis)
    out = leaky_relu(jnp.where(s > 0, zmax, zmin) * s + b).astype(dtype)
    if not mean_pool:
        return out
    mean = jnp.mean(leaky_relu(z32 * s + b), axis=axis).astype(dtype)
    return out, mean


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(…, C) → (…, H, D) with head h owning channels [h·D, (h+1)·D).

    Matches the reference's channel-major head split
    (``view(B, heads, depth, N)``, models/attention.py:332-336).
    """
    return x.reshape(*x.shape[:-1], num_heads, x.shape[-1] // num_heads)


def merge_heads(x: jax.Array) -> jax.Array:
    """(…, H, D) → (…, C)."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])
