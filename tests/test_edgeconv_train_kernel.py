"""Differential tests for the fused train-mode EdgeConv kernel.

The custom VJP hand-derives the full BatchNorm batch-moment backward
(docs in kernels/edgeconv_train.py), so both the forward values AND every
gradient are checked against jax.grad of the reference slab chain
(gather → BN1 → leaky → conv2 → BN2 → leaky → max over K) in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu import ops
from samble_tpu.kernels.edgeconv_train import EPS, edgeconv_train

ALPHA = 0.2


def _leaky(x):
    return jnp.where(x >= 0, x, ALPHA * x)


def _bn(x, gamma, beta):
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=axes)
    var = jnp.mean(jnp.square(x), axis=axes) - jnp.square(mu)
    xhat = (x - mu) / jnp.sqrt(var + EPS)
    return gamma * xhat + beta, mu, var


def _chain_reference(u, w, idx, g1, b1, w2, g2, b2):
    """The slab chain the kernel replaces (K-first layout)."""
    w_nb = ops.index_points(w, idx)  # (B, N, K, C1)
    g = u[:, :, None] + w_nb
    q, mu1, var1 = _bn(g, g1, b1)
    z = _leaky(q)
    y = z @ w2
    h, mu2, var2 = _bn(y, g2, b2)
    out = jnp.max(_leaky(h), axis=2)  # (B, N, C2)
    return out, (mu1, var1, mu2, var2)


def _setup(b=2, n=128, k=5, c1=8, c2=12, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    xn = ops.neighbors.knn_normalized(xyz)
    u = jnp.asarray(rng.normal(size=(b, n, c1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(b, n, c1)).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(c1, c2)) / np.sqrt(c1)).astype(np.float32))
    g1 = jnp.asarray((1.0 + 0.3 * rng.normal(size=c1)).astype(np.float32))
    b1 = jnp.asarray((0.2 * rng.normal(size=c1)).astype(np.float32))
    # mixed-sign gamma2 exercises the max/min monotonicity dispatch
    g2 = jnp.asarray(
        (rng.normal(size=c2) + 0.2 * np.sign(rng.normal(size=c2)))
        .astype(np.float32))
    b2 = jnp.asarray((0.2 * rng.normal(size=c2)).astype(np.float32))
    idx = ops.neighbors.knn_indices(xyz, k)
    return xyz, xn, u, w, w2, g1, b1, g2, b2, idx


def test_forward_matches_chain():
    _, xn, u, w, w2, g1, b1, g2, b2, idx = _setup()
    ref, (m1, v1, m2, v2) = _chain_reference(u, w, idx, g1, b1, w2, g2, b2)
    out, (km1, kv1, km2, kv2) = edgeconv_train(
        5, ALPHA, True, u, w, xn, g1, b1, w2, g2, b2)
    np.testing.assert_allclose(np.asarray(km1), np.asarray(m1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(kv1), np.asarray(v1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(km2), np.asarray(m2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kv2), np.asarray(v2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_chain():
    _, xn, u, w, w2, g1, b1, g2, b2, idx = _setup(seed=3)
    rng = np.random.default_rng(9)
    ct = jnp.asarray(rng.normal(size=(2, 128, 12)).astype(np.float32))

    def loss_ref(u_, w_, g1_, b1_, w2_, g2_, b2_):
        out, _ = _chain_reference(u_, w_, idx, g1_, b1_, w2_, g2_, b2_)
        return jnp.sum(out * ct)

    def loss_kernel(u_, w_, g1_, b1_, w2_, g2_, b2_):
        out, _ = edgeconv_train(5, ALPHA, True, u_, w_, xn,
                                g1_, b1_, w2_, g2_, b2_)
        return jnp.sum(out * ct)

    args = (u, w, g1, b1, w2, g2, b2)
    ref_grads = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    ker_grads = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    names = ["u", "w", "gamma1", "beta1", "w2", "gamma2", "beta2"]
    for name, rg, kg in zip(names, ref_grads, ker_grads):
        np.testing.assert_allclose(
            np.asarray(kg), np.asarray(rg), rtol=5e-4, atol=5e-5,
            err_msg=f"gradient mismatch: {name}",
        )


@pytest.mark.parametrize("seed", [1, 2])
def test_gradients_match_chain_more_seeds(seed):
    _, xn, u, w, w2, g1, b1, g2, b2, idx = _setup(
        b=1, n=64, k=7, c1=6, c2=10, seed=seed)
    rng = np.random.default_rng(seed + 100)
    ct = jnp.asarray(rng.normal(size=(1, 64, 10)).astype(np.float32))

    def loss_ref(u_, w_, g1_, b1_, w2_, g2_, b2_):
        out, _ = _chain_reference(u_, w_, idx, g1_, b1_, w2_, g2_, b2_)
        return jnp.sum(out * ct)

    def loss_kernel(u_, w_, g1_, b1_, w2_, g2_, b2_):
        out, _ = edgeconv_train(7, ALPHA, True, u_, w_, xn,
                                g1_, b1_, w2_, g2_, b2_)
        return jnp.sum(out * ct)

    args = (u, w, g1, b1, w2, g2, b2)
    ref_grads = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    ker_grads = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    for name, rg, kg in zip(
        ["u", "w", "gamma1", "beta1", "w2", "gamma2", "beta2"],
        ref_grads, ker_grads,
    ):
        np.testing.assert_allclose(
            np.asarray(kg), np.asarray(rg), rtol=1e-3, atol=1e-4,
            err_msg=f"gradient mismatch: {name}",
        )
