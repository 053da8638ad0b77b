"""Pallas kernels under a multi-device mesh (kernels/spmd.py).

``pallas_call`` has no GSPMD partitioning rule — unwrapped, a sharded
operand is all-gathered and the kernel runs replicated on every device.
These tests pin the shard_map dispatch: same numbers as the single-device
call, ZERO collectives in the compiled program, and gradients flowing
through the custom-VJP kernels per shard.  Kernels run in interpret mode
(CPU), which exercises the identical shard_map structure the TPU path
compiles.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu import kernels, ops
from samble_tpu.kernels import spmd
from samble_tpu.kernels.gather import gather_knn_kfirst
from samble_tpu.parallel import make_mesh

B, N, C, K = 8, 64, 16, 8


@pytest.fixture
def mesh():
    m = make_mesh(jax.devices()[:8])
    yield m
    spmd.install_mesh(None)


def _collectives(jitted, *args):
    txt = jitted.lower(*args).compile().as_text()
    return [
        op for op in ("all-reduce(", "all-gather(", "all-to-all(",
                      "collective-permute(")
        if op in txt
    ]


def test_knn_pallas_sharded_matches_and_no_collectives(mesh):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    xn = np.asarray(ops.neighbors.knn_normalized(jnp.asarray(x)))

    f = jax.jit(lambda a: kernels.knn_pallas(a, a, K, interpret=True))

    spmd.install_mesh(None)  # unsharded baseline
    d0, i0 = f(jnp.asarray(xn))

    spmd.install_mesh(mesh)
    from samble_tpu.parallel import shard_batch

    xs = shard_batch(mesh, (xn,))[0]
    assert _collectives(f, xs) == []
    d1, i1 = f(xs)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_gather_knn_kfirst_sharded_grads(mesh):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(B, N, C)).astype(np.float32)
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    xn = np.asarray(ops.neighbors.knn_normalized(jnp.asarray(x)))

    def loss(w_, xn_):
        g, idx = gather_knn_kfirst(w_, xn_, K, True)
        return jnp.sum(g**2), idx

    grad_f = jax.jit(jax.grad(lambda a, b: loss(a, b)[0]))

    spmd.install_mesh(None)
    g0 = grad_f(jnp.asarray(w), jnp.asarray(xn))

    spmd.install_mesh(mesh)
    from samble_tpu.parallel import shard_batch

    ws, xns = shard_batch(mesh, (w, xn))
    assert _collectives(grad_f, ws, xns) == []
    g1 = grad_f(ws, xns)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5,
                               atol=1e-6)


def test_n2p_attention_fused_sharded_matches(mesh):
    rng = np.random.default_rng(2)
    h, dq = 2, 8
    q = rng.normal(size=(B, N, h * dq)).astype(np.float32)
    k = rng.normal(size=(B, N, h * dq)).astype(np.float32)
    v = rng.normal(size=(B, N, h * dq)).astype(np.float32)
    xn = np.asarray(
        ops.neighbors.knn_normalized(
            jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        )
    )

    f = jax.jit(lambda q_, k_, v_, xn_: kernels.n2p_attention_fused(
        q_, k_, v_, xn_, h, 1.0 / float(np.sqrt(dq)), False, False, K,
        interpret=True,
    ))

    spmd.install_mesh(None)
    o0 = f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xn))

    spmd.install_mesh(mesh)
    from samble_tpu.parallel import shard_batch

    qs, ks, vs, xns = shard_batch(mesh, (q, k, v, xn))
    assert _collectives(f, qs, ks, vs, xns) == []
    o1 = f(qs, ks, vs, xns)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=2e-5,
                               atol=2e-5)


def test_indivisible_batch_falls_back(mesh):
    """B=6 on an 8-device mesh: the wrapper must pass through (replicated),
    still correct."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, N, C)).astype(np.float32)
    xn = np.asarray(ops.neighbors.knn_normalized(jnp.asarray(x)))
    spmd.install_mesh(mesh)
    d, i = kernels.knn_pallas(jnp.asarray(xn), jnp.asarray(xn), K,
                              interpret=True)
    spmd.install_mesh(None)
    d0, i0 = kernels.knn_pallas(jnp.asarray(xn), jnp.asarray(xn), K,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i0))
