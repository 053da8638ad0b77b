"""Point embedding modules: EdgeConv and the STN input transform.

Reference: models/embedding.py:7-39 (EdgeConv), :42-97 (STN).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.nn.common import (
    Conv1x1,
    ConvBNLeaky,
    PointBatchNorm,
    bn_leaky_pool,
    leaky_relu,
)


def fused_slab_chain_block(w_nb, u, raw_bn1, raw_conv2, raw_bn2, *,
                           train: bool, dtype, interpret: bool = False):
    """BN1 → leaky → conv2 → BN2 → leaky → max over K, slab-streamed.

    Shared tail of every EdgeConv-shaped block once the (B, K, N, C1)
    neighbor slab exists.  The chain runs as ONE Pallas pass per direction
    (kernels/slab_chain.py) instead of XLA's ~10 slab round-trips: BN1's
    batch moments come from a fused XLA reduce over the virtual slab (the
    ``u`` broadcast-add fuses into the reduce), the kernel streams
    leaky(s1·g+b1) @ W2 emitting per-point max/min and the Σz/Σz² that ARE
    BN2's moments, and BN2∘leaky is applied to the pooled values only
    (monotone-commute, nn/common.py::bn_leaky_pool).  Running statistics
    update through the same RawBN accessors as the composed path — the
    parameter tree and checkpoints are identical.

    :param raw_bn1 / raw_bn2: ``callable(update_moments=None) ->
        (scale, bias, ra_mean, ra_var)`` (PointBatchNorm ``raw_features`` /
        ConvBNLeaky ``part='raw_bn'`` accessors)
    :param raw_conv2: zero-arg callable returning the (C1, C2) f32 conv
        kernel (ConvBNLeaky ``part='raw_conv'``)
    """
    from samble_tpu import kernels

    sg = jax.lax.stop_gradient
    b, k, n, c1 = w_nb.shape
    p = b * k * n
    w2 = raw_conv2()  # (C1, C2) f32

    if train:
        gv = w_nb.astype(jnp.float32) + u.astype(jnp.float32)[:, None]
        mu1 = jnp.mean(gv, axis=(0, 1, 2))
        var1 = jnp.mean(jnp.square(gv), axis=(0, 1, 2)) - jnp.square(mu1)
        scale1, bias1, _, _ = raw_bn1((sg(mu1), sg(var1)))
    else:
        scale1, bias1, mu1, var1 = raw_bn1(None)
    s1 = scale1 * jax.lax.rsqrt(var1 + 1e-5)
    b1 = bias1 - mu1 * s1

    zmax, zmin, zsum, zsq = kernels.slab_chain(
        w_nb, u.astype(w_nb.dtype), s1, b1, w2, 0.2, interpret
    )

    if train:
        mu2 = jnp.sum(zsum, axis=0) / p
        var2 = jnp.sum(zsq, axis=0) / p - jnp.square(mu2)
        scale2, bias2, _, _ = raw_bn2((sg(mu2), sg(var2)))
    else:
        scale2, bias2, mu2, var2 = raw_bn2(None)
    s2 = scale2 * jax.lax.rsqrt(var2 + 1e-5)
    b2 = bias2 - mu2 * s2
    out = jnp.where(s2 > 0, zmax, zmin) * s2 + b2
    return jnp.where(out >= 0, out, 0.2 * out).astype(dtype)


def fused_slab_chain_knn_block(w, u, xn, knn_k, raw_bn1, raw_conv2,
                               raw_bn2, *, dtype, interpret: bool = False):
    """Train-mode EdgeConv tail with the gather, BN1 (params + moments +
    exact moment backward), chain, and backward scatter all inside ONE
    custom-VJP unit (kernels/slab_chain.py::slab_chain_knn) — the
    cotangent slab never exists and no standalone scatter kernel runs.
    Same parameter tree as every other path (RawBN aliasing)."""
    from samble_tpu import kernels

    sg = jax.lax.stop_gradient
    gamma1, beta1, _, _ = raw_bn1(None)
    w2 = raw_conv2()
    zmax, zmin, zsum, zsq, mu1, var1 = kernels.slab_chain_knn(
        w, u.astype(w.dtype), xn, gamma1, beta1, w2,
        knn_k, 0.2, interpret, None,
    )
    raw_bn1((sg(mu1), sg(var1)))
    p = w.shape[0] * knn_k * w.shape[1]
    mu2 = jnp.sum(zsum, axis=0) / p
    var2 = jnp.sum(zsq, axis=0) / p - jnp.square(mu2)
    scale2, bias2, _, _ = raw_bn2((sg(mu2), sg(var2)))
    s2 = scale2 * jax.lax.rsqrt(var2 + 1e-5)
    b2 = bias2 - mu2 * s2
    out = jnp.where(s2 > 0, zmax, zmin) * s2 + b2
    return jnp.where(out >= 0, out, 0.2 * out).astype(dtype)


def probe_cbl_affine(cbl, c_in: int, dtype=jnp.float32):
    """Recover the pre-activation affine of a ConvBNLeaky in eval mode.

    conv + frozen BN is affine and the trailing LeakyReLU(0.2) is
    invertible, so probing with [zeros; eye] and applying leaky⁻¹ yields
    ``(W (c_in, c_out), b (c_out,))`` with ``cbl(g) = leaky(gᵀW + b)``.
    Calling the module on the probes registers the exact same parameters as
    a real call — fused and gather paths share one tree.
    """
    probes = jnp.concatenate(
        [jnp.zeros((1, 1, c_in), dtype), jnp.eye(c_in, dtype=dtype)[None]], 1
    )
    pr = cbl(probes)  # (1, c_in + 1, c_out)
    pr = jnp.where(pr >= 0, pr, pr / 0.2)  # leaky⁻¹ (slope matches cbl)
    b = pr[0, 0]
    return pr[0, 1:] - b[None], b


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
    impl: str = "auto"  # 'auto' | 'fused' | 'gather'
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, precomputed=None) -> jax.Array:
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
        x_knn = x[..., :3] if (self.normal_channel and c == 6) else x
        x = x.astype(self.dtype)

        # Every group mode reduces to a rank-1 pre-activation
        # z_ij = u_i + w_j of two per-point vectors:
        if self.group_type == "center_diff":
            w_center, w_diff = kernel[:c], kernel[c:]
            u = x @ (w_center - w_diff)  # (B, N, C1)
            w = x @ w_diff
        elif self.group_type == "center_neighbor":
            u = x @ kernel[:c]
            w = x @ kernel[c:]
        elif self.group_type == "diff":
            w = x @ kernel
            u = -w
        elif self.group_type == "neighbor":
            w = x @ kernel
            u = jnp.zeros_like(w)
        else:
            raise ValueError(f"unknown group_type: {self.group_type}")

        bn1 = PointBatchNorm(use_running_average=not self.train, dtype=self.dtype)
        cbl = ConvBNLeaky(self.conv2_out, train=self.train, dtype=self.dtype)

        if precomputed is not None:
            # Shared-front path: the caller already gathered this layer's
            # INPUT rows (K-first) under some externally chosen kNN graph —
            # in the seg model, the raw-xyz graph shared with the STN front
            # (one fused kNN-gather feeds both; see SegModel).  The 1x1
            # conv is linear, so gather(x @ W) == gather(x) @ W and the
            # neighbor term of the rank-1 pre-activation is one small
            # matmul over the (B, K, N, C) slab instead of a second
            # gather/scatter pair.  BN/conv algebra below is bitwise the
            # gather branch's (same submodules, same call order — the
            # parameter tree is unchanged).
            g_in, _idx = precomputed
            if self.group_type in ("center_diff", "center_neighbor"):
                w_map = kernel[c:]
            else:  # 'diff' | 'neighbor'
                w_map = kernel
            w_nb = jnp.einsum(
                "bknc,cd->bknd", g_in.astype(self.dtype), w_map
            )  # (B, K, N, conv1_out)
            from samble_tpu import kernels as _k

            if _k.use_pallas():
                return fused_slab_chain_block(
                    w_nb, u,
                    lambda um=None: bn1(
                        raw_features=self.conv1_out, update_moments=um
                    ),
                    lambda: cbl(part="raw_conv", in_features=self.conv1_out),
                    lambda um=None: cbl(part="raw_bn", update_moments=um),
                    train=self.train, dtype=self.dtype,
                    interpret=_k.interpret_default(),
                )
            g = u[:, None] + w_nb
            g = bn1(g)
            g = leaky_relu(g)
            z = cbl(g, part="conv")
            return bn_leaky_pool(
                lambda um=None: cbl(part="raw_bn", update_moments=um),
                z, axis=1, train=self.train,
            )  # (B, N, conv2_out)

        from samble_tpu import kernels

        use_fused = self.impl == "fused" or (
            self.impl == "auto"
            and not self.train  # slab-free train kernel measured slower
            and kernels.use_pallas()
            and n >= 256
            and self.k <= 128
        )
        if use_fused and self.train:
            # Fused train path (kernels/edgeconv_train.py): the whole
            # BN→leaky→conv→BN→leaky→max chain AND its exact BatchNorm
            # batch-moment backward run slab-free — nothing O(B·K·N·C)
            # touches HBM.  Correct (tests/test_edgeconv_train_module.py)
            # but NOT selected by 'auto': its three streamed passes redo
            # the one-hot selection ~6× vs the gather path's ~2×, and on
            # TPU that costs more than the slab traffic it saves (seg
            # train step 160 → 225 ms; docs/kernels.md "Fused train-mode
            # EdgeConv: a measured dead end").  The raw_* accessors read
            # γ/β and the conv kernel through the SAME submodules as the
            # gather path (aliased names), so the parameter tree and
            # checkpoints are identical; the kernel hands back the batch
            # moments and the second raw_bn call folds them into the
            # running stats exactly as nn.BatchNorm would.
            c1 = self.conv1_out
            scale1, bias1, _, _ = bn1(raw_features=c1)
            w2k = cbl(part="raw_conv", in_features=c1)
            scale2, bias2, _, _ = cbl(part="raw_bn")
            out, moments = kernels.edgeconv_train(
                self.k, 0.2, kernels.interpret_default(),
                u.astype(jnp.float32), w.astype(jnp.float32),
                ops.neighbors.knn_normalized(x_knn),
                scale1, bias1, w2k, scale2, bias2,
            )
            moments = jax.lax.stop_gradient(moments)
            bn1(raw_features=c1, update_moments=moments[:2])
            cbl(part="raw_bn", update_moments=moments[2:])
            return out.astype(self.dtype)
        if use_fused:
            # Fused eval path (kernels/edgeconv.py): in eval mode BN is a
            # per-channel affine, so probe the existing submodules for
            # their affine forms — the parameter tree stays identical to
            # the gather path, checkpoints interchange freely.  The kNN
            # selection happens inside the kernel (edgeconv_knn_pallas).
            c1 = self.conv1_out
            zero = jnp.zeros((1, 1, c1), self.dtype)
            one = jnp.ones((1, 1, c1), self.dtype)
            b1 = bn1(zero)  # (1, 1, C1)
            a1 = bn1(one) - b1
            u_p = a1[0] * u + b1[0]
            w_p = a1[0] * w
            w2, b2 = probe_cbl_affine(cbl, c1, self.dtype)
            return kernels.edgeconv_knn_pallas(
                u_p, w_p, ops.neighbors.knn_normalized(x_knn), self.k,
                w2, b2, alpha=0.2,
                interpret=kernels.interpret_default(),
            )

        if kernels.use_pallas() and n >= 256 and self.impl != "gather":
            # Training path: BatchNorm needs the real (pair-level)
            # pre-activation statistics, so the grouped tensor must exist —
            # but XLA's serial gather is what made this path 10x slower
            # than eval (docs/kernels.md).  gather_knn_kfirst fuses the kNN
            # selection INTO the one-hot-matmul gather (the extraction
            # compare is the gather one-hot; the packed key's low bits give
            # the index output for the backward scatter), so the standalone
            # kNN pass disappears; the BN/conv algebra is bitwise the
            # layout-transposed twin of the axis-2 branch below (moments
            # span all non-channel axes either way).
            if self.train:
                return fused_slab_chain_knn_block(
                    w, u, ops.neighbors.knn_normalized(x_knn), self.k,
                    lambda um=None: bn1(
                        raw_features=self.conv1_out, update_moments=um
                    ),
                    lambda: cbl(part="raw_conv",
                                in_features=self.conv1_out),
                    lambda um=None: cbl(part="raw_bn", update_moments=um),
                    dtype=self.dtype,
                    interpret=kernels.interpret_default(),
                )  # (B, N, conv2_out)
            # eval corner (k > 128 keeps the fused eval kernel away):
            # running-average BN through the two-step chain
            from samble_tpu.kernels.gather import gather_knn_kfirst

            w_nb, _ = gather_knn_kfirst(
                w, ops.neighbors.knn_normalized(x_knn), self.k,
                kernels.interpret_default(),
            )
            return fused_slab_chain_block(
                w_nb, u,
                lambda um=None: bn1(
                    raw_features=self.conv1_out, update_moments=um
                ),
                lambda: cbl(part="raw_conv", in_features=self.conv1_out),
                lambda um=None: cbl(part="raw_bn", update_moments=um),
                train=False, dtype=self.dtype,
                interpret=kernels.interpret_default(),
            )  # (B, N, conv2_out)
        idx = ops.neighbors.knn_indices(x_knn, self.k)
        g = u[:, :, None] + ops.index_points(w, idx)  # (B, N, K, conv1_out)
        g = bn1(g)
        g = leaky_relu(g)
        z = cbl(g, part="conv")
        return bn_leaky_pool(
            lambda um=None: cbl(part="raw_bn", update_moments=um),
            z, axis=2, train=self.train,
        )  # (B, N, conv2_out)


class STN(nn.Module):
    """Spatial transformer predicting a 3×3 input alignment matrix.

    Operates on a center_diff kNN grouping of the raw xyz (so input channel
    count is 6).  The final linear layer is zero-weight / identity-bias
    initialized so training starts from the identity transform.

    Reference: models/embedding.py:42-97; applied in models/seg_model.py:181-190.

    The grouped front (ConvBNLeaky ×2 → max over K) has exactly the fused
    EdgeConv structure, so eval mode reuses kernels.edgeconv_pallas with the
    two submodules' affines recovered by leaky-inverse probing (measured
    38.5 ms for the grouped XLA path at B=32, N=2048 — the largest single
    block of the seg forward).  The parameter tree is identical either way.
    """

    k: int = 32  # kNN degree of the grouping (hardcoded in the reference)
    impl: str = "auto"  # 'auto' | 'fused' | 'gather'
    share_front: bool = False  # also return (gathered xyz K-first, idx)
    train: bool = True
    dtype: Any = jnp.float32  # computation dtype; params/BN moments stay f32

    @nn.compact
    def __call__(self, xyz: jax.Array):
        # xyz: (B, N, 3)
        b, n, _ = xyz.shape
        xyz_f32 = xyz.astype(jnp.float32)  # kNN graph stays f32 under AMP
        xyz = xyz.astype(self.dtype)
        cbl1 = ConvBNLeaky(64, train=self.train, dtype=self.dtype)
        cbl2 = ConvBNLeaky(128, train=self.train, dtype=self.dtype)
        front = None  # (gathered xyz (B,K,N,3), idx) when share_front

        from samble_tpu import kernels

        use_fused = self.impl == "fused" or (
            self.impl == "auto"
            and not self.train  # slab-free train kernel measured slower
            and kernels.use_pallas()
            and n >= 256
        )
        if use_fused and self.train:
            # Fused train path — the grouped front has exactly the
            # EdgeConv train structure (BN1→leaky→conv2→BN2→leaky→max),
            # so it runs on kernels.edgeconv_train with cbl1's conv hoisted
            # into the rank-1 pair terms (center_diff algebra as below) and
            # both BN stages' moments computed inside the kernel.  Correct
            # but explicitly opt-in only (impl='fused'), not 'auto': like
            # EdgeConv above, it measured slower than the gather path
            # (STN 43.8 → 58.3 ms in the seg train step; docs/kernels.md
            # "Fused train-mode EdgeConv: a measured dead end").
            w1k = cbl1(part="raw_conv", in_features=6)  # (6, 64) f32
            xyz32 = xyz.astype(jnp.float32)
            u = xyz32 @ (w1k[:3] - w1k[3:])
            w = xyz32 @ w1k[3:]
            scale1, bias1, _, _ = cbl1(part="raw_bn")
            w2k = cbl2(part="raw_conv", in_features=64)
            scale2, bias2, _, _ = cbl2(part="raw_bn")
            x, moments = kernels.edgeconv_train(
                self.k, 0.2, kernels.interpret_default(),
                u, w, ops.neighbors.knn_normalized(xyz32),
                scale1, bias1, w2k, scale2, bias2,
            )
            moments = jax.lax.stop_gradient(moments)
            cbl1(part="raw_bn", update_moments=moments[:2])
            cbl2(part="raw_bn", update_moments=moments[2:])
            x = x.astype(self.dtype)  # (B, N, 128), max over K fused
        elif use_fused:
            w1, b1 = probe_cbl_affine(cbl1, 6, self.dtype)  # (6, 64), (64,)
            w2, b2 = probe_cbl_affine(cbl2, 64, self.dtype)
            # center‖diff concat hoist: gᵀW1' = x_i·(W1'c − W1'd) + x_j·W1'd
            u = xyz @ (w1[:3] - w1[3:]) + b1
            w = xyz @ w1[3:]
            x = kernels.edgeconv_knn_pallas(
                u, w, ops.neighbors.knn_normalized(xyz), self.k,
                w2, b2, alpha=0.2,
                interpret=kernels.interpret_default(),
            )  # (B, N, 128), max over K fused
        else:
            # Train path (and non-Pallas eval): hoist cbl1's conv before
            # the gather — it is linear and bias-free, so for center_diff
            # pairs g = [x_i ‖ x_j − x_i]:  conv(g) = u_i + w_j  with
            # w = x@W_d (probe [0‖x]) and u = x@(W_c − W_d) = [x‖x]@W − 2w.
            # Exactly EdgeConv's train-path structure: the kNN selection is
            # fused into the K-first one-hot-matmul gather, and the BN/max
            # chain runs on the (B, K, N, C) twin layout (same moments).
            # This replaced a grouped (B,N,K,6) front whose XLA
            # gather/scatter-add backward dominated the seg train step
            # (55 ms of 178 at B=32, N=2048 — tools/profile_seg_train.py).
            zeros = jnp.zeros_like(xyz)
            w = cbl1(jnp.concatenate([zeros, xyz], -1), part="conv")
            u = cbl1(jnp.concatenate([xyz, xyz], -1), part="conv") - 2.0 * w
            if kernels.use_pallas() and n >= 256:
                from samble_tpu.kernels.gather import gather_knn_kfirst

                if self.share_front:
                    # One fused kNN-gather serves TWO consumers: the 64-ch
                    # STN front slab AND the raw gathered xyz the seg
                    # model's EdgeConv#0 re-projects (gather is per-point
                    # row selection, so gather(x @ W) == gather(x) @ W —
                    # widening the gather 64 → 67 channels is free next to
                    # a second full extraction + backward scatter pass).
                    cat = jnp.concatenate([w, xyz], axis=-1)  # (B, N, 67)
                    g_cat, idx = gather_knn_kfirst(
                        cat, ops.neighbors.knn_normalized(xyz_f32), self.k,
                        kernels.interpret_default(),
                    )  # (B, K, N, 67)
                    w_nb = g_cat[..., : w.shape[-1]]
                    front = (g_cat[..., w.shape[-1]:], idx)
                    # shared-front slab: BN1→leaky→conv2 + pooled BN2
                    # stream as one Pallas pass per direction
                    x = fused_slab_chain_block(
                        w_nb, u,
                        lambda um=None: cbl1(part="raw_bn",
                                             update_moments=um),
                        lambda: cbl2(part="raw_conv", in_features=64),
                        lambda um=None: cbl2(part="raw_bn",
                                             update_moments=um),
                        train=self.train, dtype=self.dtype,
                        interpret=kernels.interpret_default(),
                    )  # (B, N, 128)
                elif self.train:
                    # unshared: gather + chain + backward scatter composed
                    # into one custom-VJP unit (the cotangent slab never
                    # exists in HBM)
                    x = fused_slab_chain_knn_block(
                        w, u, ops.neighbors.knn_normalized(xyz_f32),
                        self.k,
                        lambda um=None: cbl1(part="raw_bn",
                                             update_moments=um),
                        lambda: cbl2(part="raw_conv", in_features=64),
                        lambda um=None: cbl2(part="raw_bn",
                                             update_moments=um),
                        dtype=self.dtype,
                        interpret=kernels.interpret_default(),
                    )  # (B, N, 128)
                    front = None
                else:
                    # eval with impl='gather' forced: running-average BN
                    w_nb, _ = gather_knn_kfirst(
                        w, ops.neighbors.knn_normalized(xyz_f32), self.k,
                        kernels.interpret_default(),
                    )
                    x = fused_slab_chain_block(
                        w_nb, u,
                        lambda um=None: cbl1(part="raw_bn",
                                             update_moments=um),
                        lambda: cbl2(part="raw_conv", in_features=64),
                        lambda um=None: cbl2(part="raw_bn",
                                             update_moments=um),
                        train=False, dtype=self.dtype,
                        interpret=kernels.interpret_default(),
                    )  # (B, N, 128)
                    front = None
            else:
                idx = ops.neighbors.knn_indices(xyz_f32, self.k)
                g = u[:, :, None] + ops.index_points(w, idx)  # (B,N,K,64)
                if self.share_front:
                    # K-first layout to match the Pallas branch's contract
                    g_xyz = jnp.transpose(
                        ops.index_points(xyz, idx), (0, 2, 1, 3)
                    )  # (B, K, N, 3)
                    front = (g_xyz, idx)
                else:
                    front = None
                g = cbl1(g, part="bnleaky")
                z = cbl2(g, part="conv")
                x = bn_leaky_pool(
                    lambda um=None: cbl2(part="raw_bn", update_moments=um),
                    z, axis=2, train=self.train,
                )  # (B, N, 128)
        cbl3 = ConvBNLeaky(1024, train=self.train, dtype=self.dtype)
        z3 = cbl3(x, part="conv")
        x = bn_leaky_pool(
            lambda um=None: cbl3(part="raw_bn", update_moments=um),
            z3, axis=1, train=self.train,
        ).astype(jnp.float32)  # (B, 1024)
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
        trans = x.reshape(b, 3, 3)
        if self.share_front:
            # ``front`` is None when a fused branch ran (those kernels do
            # not emit an index list) — the caller must fall back.
            return trans, front
        return trans
