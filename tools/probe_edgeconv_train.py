"""Decomposition of the train-mode EdgeConv block (the seg/cls train cost).

tools/profile_seg_train.py: STN front + EdgeConv#0 + EdgeConv#1 are 108 ms
of the 160 ms seg train step (B=32, N=2048) — all three share the same
structure: kNN-fused gather to a (B, K, N, C1) slab, then
BN→leaky→conv2→BN→leaky→max-over-K in XLA, plus autodiff.  This probe
times each piece at that scale to locate the harvest:

  * gather_knn_kfirst forward alone, and fwd+bwd (scatter VJP)
  * the XLA BN/conv chain on a pre-materialized slab, fwd and fwd+bwd
  * the composed layer (hoist + gather + chain), fwd and fwd+bwd
  * BN statistics reductions alone (the two population reductions)

Run on an otherwise-idle TPU:  python tools/probe_edgeconv_train.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from samble_tpu import ops
from samble_tpu.kernels.gather import gather_knn_kfirst
from samble_tpu.utils.profiling import timeit_chained

B, N, K, C1, C2 = 32, 2048, 32, 64, 64
DT = jnp.bfloat16
EPS = 1e-5
ALPHA = 0.2


def leaky(x):
    return jnp.where(x >= 0, x, ALPHA * x)


def bn(x, gamma, beta):
    """BatchNorm over all non-channel axes, biased variance (train mode)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mu)
    xhat = (x32 - mu) / jnp.sqrt(var + EPS)
    return (gamma * xhat + beta).astype(x.dtype)


def chain(slab, u, g1, b1, w2, g2, b2):
    """BN1→leaky→conv2→BN2→leaky→max on the K-first slab (B, K, N, C1)."""
    g = u[:, None].astype(DT) + slab  # (B, K, N, C1)
    g = leaky(bn(g, g1, b1))
    h = g @ w2.astype(DT)  # (B, K, N, C2)
    h = leaky(bn(h, g2, b2))
    return jnp.max(h, axis=1)  # (B, N, C2)


def main():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    xn = jax.block_until_ready(ops.neighbors.knn_normalized(xyz))
    w = jnp.asarray(rng.normal(size=(B, N, C1)).astype(np.float32)).astype(DT)
    u = jnp.asarray(rng.normal(size=(B, N, C1)).astype(np.float32)).astype(DT)
    w2 = jnp.asarray(
        rng.normal(size=(C1, C2)).astype(np.float32) / np.sqrt(C1))
    g1 = jnp.ones((C1,), jnp.float32)
    b1 = jnp.zeros((C1,), jnp.float32)
    g2 = jnp.ones((C2,), jnp.float32)
    b2 = jnp.zeros((C2,), jnp.float32)

    res = {}

    def t(tag, fn, x0, consts=(), iters=10):
        dt = timeit_chained(fn, x0, iters=iters, consts=consts)
        res[tag] = dt * 1e3
        print(f"{tag:>42s}: {dt * 1e3:7.2f} ms", flush=True)

    # 1. gather alone
    def gather_fwd(w_, xn_):
        slab, idx = gather_knn_kfirst(w_, xn_, K)
        return jnp.sum(slab.astype(jnp.float32)) * 1e-6

    t("gather_knn_kfirst fwd", gather_fwd, w, (xn,))

    def gather_fb(w_, xn_):
        gr = jax.grad(
            lambda ww: jnp.sum(gather_knn_kfirst(ww, xn_, K)[0]
                               .astype(jnp.float32)))(w_)
        return jnp.sum(gr.astype(jnp.float32)) * 1e-6

    t("gather_knn_kfirst fwd+bwd", gather_fb, w, (xn,))

    # 2. XLA chain on a pre-materialized slab
    slab, idx = jax.block_until_ready(gather_knn_kfirst(w, xn, K))

    def chain_fwd(slab_, u_, w2_):
        out = chain(slab_, u_, g1, b1, w2_, g2, b2)
        return jnp.sum(out.astype(jnp.float32)) * 1e-6

    t("XLA chain fwd (slab given)", chain_fwd, slab, (u, w2))

    def chain_fb(slab_, u_, w2_):
        gr = jax.grad(
            lambda s: jnp.sum(chain(s, u_, g1, b1, w2_, g2, b2)
                              .astype(jnp.float32)))(slab_)
        return jnp.sum(gr.astype(jnp.float32)) * 1e-6

    t("XLA chain fwd+bwd (slab given)", chain_fb, slab, (u, w2))

    # 3. BN statistic reductions alone on the slab
    def bn_stats(slab_):
        x32 = slab_.astype(jnp.float32)
        return (jnp.sum(jnp.mean(x32, axis=(0, 1, 2)))
                + jnp.sum(jnp.mean(jnp.square(x32), axis=(0, 1, 2))))

    t("BN stats reductions (one slab)", bn_stats, slab)

    # 4. max over K alone
    def max_k(slab_):
        return jnp.sum(jnp.max(slab_, axis=1).astype(jnp.float32)) * 1e-6

    t("max over K (one slab)", max_k, slab)

    # 5. composed layer end to end
    def layer(w_, u_, xn_, w2_):
        slab_, _ = gather_knn_kfirst(w_, xn_, K)
        out = chain(slab_, u_, g1, b1, w2_, g2, b2)
        return jnp.sum(out.astype(jnp.float32)) * 1e-6

    t("layer fwd (gather+chain)", layer, w, (u, xn, w2))

    def layer_fb(w_, u_, xn_, w2_):
        gr = jax.grad(
            lambda ww, uu, ww2: layer(ww, uu, xn_, ww2),
            argnums=(0, 1, 2))(w_, u_, w2_)
        return sum(jnp.sum(g.astype(jnp.float32)) for g in gr) * 1e-6

    t("layer fwd+bwd (gather+chain)", layer_fb, w, (u, xn, w2))

    print(flush=True)
    for k, v in res.items():
        print(f"| {k} | {v:.2f} |")


if __name__ == "__main__":
    main()
