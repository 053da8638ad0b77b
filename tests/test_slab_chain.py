"""slab_chain kernel: streamed BN1→leaky→conv2→pooled stats + custom VJP.

Differential gates against the plain XLA composition (the EdgeConv gather
path's slab chain), in f32 and bf16, forward and gradients — including the
moment cotangents (dΣz, dΣz² reach every pair) and the even-split max/min
tie subgradient.  Runs the kernel in interpret mode on the CPU test
platform, exactly as the TPU executes it.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samble_tpu.kernels.slab_chain import slab_chain

B, K, N, C1, C2 = 2, 8, 256, 16, 32
ALPHA = 0.2


def _data(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    w_nb = jnp.asarray(rng.normal(size=(B, K, N, C1)), dtype)
    u = jnp.asarray(rng.normal(size=(B, N, C1)), dtype)
    s1 = jnp.asarray(rng.normal(size=C1).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=C1).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(C1, C2)).astype(np.float32) * 0.3)
    return w_nb, u, s1, b1, w2


def _reference(w_nb, u, s1, b1, w2):
    """The XLA composition the kernel replaces (matching dtype discipline:
    bf16 matmul operands when the slab is bf16, f32 accumulation)."""
    g = w_nb.astype(jnp.float32) + u.astype(jnp.float32)[:, None]
    a = g * s1 + b1
    y = jnp.where(a >= 0, a, ALPHA * a)
    z = jax.lax.dot_general(
        y.astype(w_nb.dtype), w2.astype(w_nb.dtype),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, K, N, C2)
    return (
        jnp.max(z, axis=1),
        jnp.min(z, axis=1),
        jnp.sum(z, axis=(1, 2)),
        jnp.sum(z * z, axis=(1, 2)),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches(dtype):
    w_nb, u, s1, b1, w2 = _data(dtype)
    out_k = slab_chain(w_nb, u, s1, b1, w2, ALPHA, True)
    out_r = _reference(w_nb, u, s1, b1, w2)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    # zsum/zsq accumulate over 2048 pairs — compare relative to the scale
    for a, b, rt in zip(out_k, out_r, (tol, tol, tol * 50, tol * 50)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rt,
            atol=rt * max(1.0, float(jnp.abs(b).max())),
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradients_match(dtype):
    w_nb, u, s1, b1, w2 = _data(dtype)
    rng = np.random.default_rng(1)
    # pull on every output with random cotangent-shaped weights so all four
    # paths (max, min, Σz, Σz²) are exercised at once
    wts = [jnp.asarray(rng.normal(size=(B, N, C2)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(B, N, C2)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32)) * 0.1,
           jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32)) * 0.01]

    def loss_k(w_nb, u, s1, b1, w2):
        outs = slab_chain(w_nb, u, s1, b1, w2, ALPHA, True)
        return sum(jnp.sum(o * w) for o, w in zip(outs, wts))

    def loss_r(w_nb, u, s1, b1, w2):
        outs = _reference(w_nb, u, s1, b1, w2)
        return sum(jnp.sum(o * w) for o, w in zip(outs, wts))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(w_nb, u, s1, b1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(w_nb, u, s1, b1, w2)
    tol = 1e-4 if dtype == jnp.float32 else 6e-2
    for a, b, name in zip(gk, gr, ("dw_nb", "du", "ds1", "db1", "dw2")):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(b32).max()))
        np.testing.assert_allclose(a32, b32, rtol=tol, atol=tol * scale,
                                   err_msg=name)


def test_max_tie_subgradient_even_split():
    """Duplicate neighbors → tied maxima; the VJP must split the cotangent
    evenly (jnp.max semantics), not double it."""
    w_nb, u, s1, b1, w2 = _data(jnp.float32)
    w_nb = w_nb.at[:, 1].set(w_nb[:, 0])  # neighbor 1 duplicates 0

    def loss_k(w_nb):
        zmax, _, _, _ = slab_chain(w_nb, u, s1, b1, w2, ALPHA, True)
        return jnp.sum(zmax)

    def loss_r(w_nb):
        zmax = _reference(w_nb, u, s1, b1, w2)[0]
        return jnp.sum(zmax)

    gk = jax.grad(loss_k)(w_nb)
    gr = jax.grad(loss_r)(w_nb)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_edgeconv_module_fused_matches_composed():
    """EdgeConv with the fused slab chain (forced Pallas, interpret) must
    match the composed CPU path — outputs and running stats."""
    os.environ["SAMBLE_FORCE_PALLAS"] = "1"
    try:
        from samble_tpu.nn.embedding import EdgeConv

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        ec = EdgeConv(k=8, group_type="center_diff", conv1_out=16,
                      conv2_out=16, train=True)
        v = ec.init(jax.random.key(0), x)
        out_f, vars_f = ec.apply(v, x, mutable=["batch_stats"])
        os.environ.pop("SAMBLE_FORCE_PALLAS")
        out_c, vars_c = ec.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                                   rtol=2e-4, atol=2e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            vars_f["batch_stats"], vars_c["batch_stats"],
        )
    finally:
        os.environ.pop("SAMBLE_FORCE_PALLAS", None)


def test_sharded_grads_match_unsharded():
    """Under an 8-device mesh the replicated params' cotangents (s1, b1,
    w2) must be psum-reduced across shards — they are real shard_map
    inputs with P() specs, not closure captures (kernels/spmd.py)."""
    import jax.sharding as shd

    from samble_tpu.kernels import spmd

    w_nb, u, s1, b1, w2 = _data(jnp.float32)

    def loss(w_nb, u, s1, b1, w2):
        zmax, zmin, zsum, zsq = slab_chain(w_nb, u, s1, b1, w2, ALPHA, True)
        return (jnp.sum(jnp.sin(zmax)) + jnp.sum(zmin)
                + jnp.sum(zsum) * 0.1 + jnp.sum(zsq) * 0.01)

    grad_f = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    g_ref = grad_f(w_nb, u, s1, b1, w2)

    mesh = shd.Mesh(np.array(jax.devices()[:2]), ("data",))
    spmd.install_mesh(mesh)
    try:
        g_sh = jax.jit(grad_f)(w_nb, u, s1, b1, w2)
    finally:
        spmd.install_mesh(None)
    for a, b, name in zip(g_ref, g_sh, ("dw_nb", "du", "ds1", "db1", "dw2")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


# ---------------------------------------------------------------------------
# slab_chain_knn: gather + BN1 (moments inside) + chain + backward scatter
# ---------------------------------------------------------------------------


def _knn_reference(w, u, xn, gamma1, beta1, w2, k):
    """Full XLA composition: kNN gather, batch-moment BN1 (differentiable
    moments), leaky, conv — the exact function slab_chain_knn fuses.

    The neighbor graph comes from the PALLAS extraction itself (the kernel
    emits its index list), so this gate pins the chain + BatchNorm-moment
    backward math, not kNN tie-breaking — packed-key-vs-XLA near-tie
    divergence has its own gates (test_kernels, the bench idx_match row)
    and otherwise flips a handful of neighbors whenever the XLA knn
    program's float contraction order changes (e.g. a foreign-machine AOT
    cache hit), which is noise for THIS test's purpose."""
    from samble_tpu import ops
    from samble_tpu.kernels.gather import _gather_knn_pallas

    xnn = ops.neighbors.knn_normalized(xn)
    idx = jax.lax.stop_gradient(
        _gather_knn_pallas(jnp.zeros_like(w), xnn, k, True)[1]
    )  # (B, N, K) — the kernel family's own graph
    n = w.shape[1]
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)  # (B, N, K, N)
    w_nb = jnp.einsum("bikn,bnc->bkic", oh, w.astype(jnp.float32))
    g = w_nb + u.astype(jnp.float32)[:, None]  # (B, K, N, C1)
    mu = jnp.mean(g, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(g), axis=(0, 1, 2)) - jnp.square(mu)
    s1 = gamma1 * jax.lax.rsqrt(var + 1e-5)
    b1 = beta1 - mu * s1
    a = g * s1 + b1
    y = jnp.where(a >= 0, a, ALPHA * a)
    z = jax.lax.dot_general(
        y.astype(w.dtype), w2.astype(w.dtype), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (jnp.max(z, axis=1), jnp.min(z, axis=1),
            jnp.sum(z, axis=(1, 2)), jnp.sum(z * z, axis=(1, 2)),
            mu, var)


def _knn_data(dtype=jnp.float32):
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(B, N, C1)), dtype)
    u = jnp.asarray(rng.normal(size=(B, N, C1)), dtype)
    xn = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    gamma1 = jnp.asarray(rng.normal(size=C1).astype(np.float32))
    beta1 = jnp.asarray(rng.normal(size=C1).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(C1, C2)).astype(np.float32) * 0.3)
    return w, u, xn, gamma1, beta1, w2


def test_knn_forward_matches_composition():
    from samble_tpu.kernels.slab_chain import slab_chain_knn
    from samble_tpu import ops

    w, u, xn, gamma1, beta1, w2 = _knn_data()
    xnn = ops.neighbors.knn_normalized(xn)
    out_k = slab_chain_knn(w, u, xnn, gamma1, beta1, w2, K, ALPHA, True,
                           None)
    out_r = _knn_reference(w, u, xn, gamma1, beta1, w2, K)
    for a, b, name in zip(out_k, out_r,
                          ("zmax", "zmin", "zsum", "zsq", "mu", "var")):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4 * scale,
            err_msg=name,
        )


def test_knn_gradients_match_composition():
    """The whole point: d w must equal the composition's gradient INCLUDING
    the BatchNorm batch-moment path (handled analytically via c0 + c1·g in
    the fused backward scatter)."""
    from samble_tpu.kernels.slab_chain import slab_chain_knn
    from samble_tpu import ops

    w, u, xn, gamma1, beta1, w2 = _knn_data()
    xnn = ops.neighbors.knn_normalized(xn)
    rng = np.random.default_rng(4)
    wts = [jnp.asarray(rng.normal(size=(B, N, C2)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(B, N, C2)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32)) * 0.1,
           jnp.asarray(rng.normal(size=(B, C2)).astype(np.float32)) * 0.01]

    def loss_k(w, u, gamma1, beta1, w2):
        outs = slab_chain_knn(w, u, xnn, gamma1, beta1, w2, K, ALPHA, True,
                              None)
        return sum(jnp.sum(o * wt) for o, wt in zip(outs[:4], wts))

    def loss_r(w, u, gamma1, beta1, w2):
        outs = _knn_reference(w, u, xn, gamma1, beta1, w2, K)
        return sum(jnp.sum(o * wt) for o, wt in zip(outs[:4], wts))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(w, u, gamma1, beta1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(w, u, gamma1, beta1, w2)
    for a, b, name in zip(gk, gr, ("dw", "du", "dgamma", "dbeta", "dw2")):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(b32).max()))
        np.testing.assert_allclose(a32, b32, rtol=3e-4, atol=3e-4 * scale,
                                   err_msg=name)


def test_knn_sharded_matches_unsharded():
    """Under a mesh the BN moments and the moment-coupling sums go global
    (pmean/psum through the injected axis) — SyncBN semantics."""
    import jax.sharding as shd

    from samble_tpu import ops
    from samble_tpu.kernels import spmd
    from samble_tpu.kernels.slab_chain import slab_chain_knn

    w, u, xn, gamma1, beta1, w2 = _knn_data()
    xnn = ops.neighbors.knn_normalized(xn)

    def loss(w, u, gamma1, beta1, w2):
        outs = slab_chain_knn(w, u, xnn, gamma1, beta1, w2, K, ALPHA, True,
                              None)
        return (jnp.sum(jnp.sin(outs[0])) + jnp.sum(outs[1])
                + 0.1 * jnp.sum(outs[2]) + 0.01 * jnp.sum(outs[3]))

    grad_f = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    fwd_f = lambda: slab_chain_knn(w, u, xnn, gamma1, beta1, w2, K, ALPHA,
                                   True, None)
    g_ref = grad_f(w, u, gamma1, beta1, w2)
    o_ref = fwd_f()
    mesh = shd.Mesh(np.array(jax.devices()[:2]), ("data",))
    spmd.install_mesh(mesh)
    try:
        g_sh = jax.jit(grad_f)(w, u, gamma1, beta1, w2)
        o_sh = fwd_f()
    finally:
        spmd.install_mesh(None)
    # EVERY output — the mesh wrapper once concatenated the replicated
    # BN moments mu1/var1 into (ndev·C1,) because out_specs applied
    # P('data') to all leaves; pin shapes AND values (SyncBN: global
    # moments must equal the unsharded run's).
    for a, b, name in zip(o_sh, o_ref,
                          ("zmax", "zmin", "zsum", "zsq", "mu1", "var1")):
        assert a.shape == b.shape, (name, a.shape, b.shape)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4,
            atol=2e-4 * max(1.0, float(jnp.abs(b).max())), err_msg=name,
        )
    assert o_sh[4].shape == (C1,) and o_sh[5].shape == (C1,)
    for a, b, name in zip(g_ref, g_sh,
                          ("dw", "du", "dgamma", "dbeta", "dw2")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_edgeconv_module_sharded_train(monkeypatch):
    """EdgeConv(train=True) end-to-end under a 2-device mesh with the
    Pallas path forced — the exact composition the advisor reproduced the
    out_specs crash with: fused_slab_chain_knn_block feeds the kernel's
    replicated mu1/var1 into the running-stat update."""
    import jax.sharding as shd

    from samble_tpu import kernels
    from samble_tpu.kernels import spmd
    from samble_tpu.nn.embedding import EdgeConv

    monkeypatch.setenv("SAMBLE_FORCE_PALLAS", "1")
    kernels.use_pallas.cache_clear()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 256, 3)).astype(np.float32))
    ec = EdgeConv(k=8, group_type="center_diff", conv1_out=16,
                  conv2_out=16, train=True)
    v = ec.init(jax.random.key(0), x)
    out_ref, vars_ref = ec.apply(v, x, mutable=["batch_stats"])
    mesh = shd.Mesh(np.array(jax.devices()[:2]), ("data",))
    spmd.install_mesh(mesh)
    try:
        out_sh, vars_sh = ec.apply(v, x, mutable=["batch_stats"])
    finally:
        spmd.install_mesh(None)
        monkeypatch.delenv("SAMBLE_FORCE_PALLAS", raising=False)
        kernels.use_pallas.cache_clear()
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        vars_sh["batch_stats"], vars_ref["batch_stats"],
    )
