"""Dense-masked vs gather N2P equivalence.

The dense implementation replaces the (B,N,K,C) neighbor gathers with full
q·kᵀ MXU matmuls + a kNN mask (see Neighbor2PointAttention._use_dense).
Mathematically identical for scalar_dot because softmax cancels the
row-constant terms; these tests pin the identity down numerically for all
four (group_type × asm) combinations, with shared parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu.nn.attention import Neighbor2PointAttention

B, N, C, K = 2, 64, 32, 8


def _make(impl, group_type, asm):
    return Neighbor2PointAttention(
        k=K, group_type=group_type, num_heads=4, attention_mode="scalar_dot",
        asm=asm, q_out=C, k_out=C, v_out=C, ff_hidden=64, ff_out=C,
        impl=impl, train=False, dtype=jnp.float32,
    )


@pytest.mark.parametrize("group_type", ["diff", "neighbor"])
@pytest.mark.parametrize("asm", ["dot", "dot-sub"])
def test_dense_equals_gather(group_type, asm):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    gather = _make("gather", group_type, asm)
    dense = _make("dense", group_type, asm)
    variables = gather.init({"params": jax.random.key(0)}, x)
    # same parameter structure: the dense path creates the identical module
    # sequence, so one variable set drives both
    out_g = gather.apply(variables, x)
    out_d = dense.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_g), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("negate", [False, True])
@pytest.mark.parametrize("subtract_v", [False, True])
def test_pallas_n2p_matches_dense(negate, subtract_v):
    """Fused kernel (interpret mode) vs the dense-masked XLA reference."""
    from samble_tpu.kernels.n2p import _n2p_pallas_fwd, n2p_dense_reference
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(1)
    heads, n, hd = 4, 128, 32
    q = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    idx = nbr.knn_indices(jnp.asarray(rng.normal(size=(2, n, 3)), jnp.float32), 8)
    scale = 1.0 / np.sqrt(hd // heads)
    out_p = _n2p_pallas_fwd(q, k, v, idx, heads, float(scale), negate,
                            subtract_v, interpret=True)
    out_d = n2p_dense_reference(q, k, v, idx, heads, float(scale), negate,
                                subtract_v)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_d), rtol=2e-4, atol=2e-5
    )


def test_n2p_backward_matches_gather_grads():
    """The custom-VJP backward (dense recompute) must produce the same
    parameter gradients as the gather path."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    gather = _make("gather", "diff", "dot")
    dense = _make("dense", "diff", "dot")
    variables = gather.init({"params": jax.random.key(0)}, x)

    def loss(params, mod):
        out = mod.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_g = jax.grad(lambda p: loss(p, gather))(variables["params"])
    g_d = jax.grad(lambda p: loss(p, dense))(variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_g),
        jax.tree_util.tree_leaves_with_path(g_d),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.mark.parametrize("negate", [False, True])
@pytest.mark.parametrize("subtract_v", [False, True])
def test_pallas_n2p_backward_kernel_matches_autodiff(negate, subtract_v):
    """Flash-style backward kernel (interpret mode) vs jax.grad of the dense
    reference — dq, dk, dv for all four algebra combos."""
    from samble_tpu.kernels.n2p import _n2p_pallas_bwd, n2p_dense_reference
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(3)
    heads, n, hd = 4, 128, 32
    q = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    idx = nbr.knn_indices(jnp.asarray(rng.normal(size=(2, n, 3)), jnp.float32), 8)
    scale = float(1.0 / np.sqrt(hd // heads))

    _, vjp = jax.vjp(
        lambda q, k, v: n2p_dense_reference(q, k, v, idx, heads, scale,
                                            negate, subtract_v),
        q, k, v,
    )
    want = vjp(g)
    got = _n2p_pallas_bwd(q, k, v, idx, g, heads, scale, negate, subtract_v,
                          interpret=True)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


@pytest.mark.parametrize("negate", [False, True])
@pytest.mark.parametrize("subtract_v", [False, True])
def test_knn_fused_n2p_matches_split_pipeline(negate, subtract_v):
    """kNN-fused attention (selection in-kernel, threshold mask) must equal
    the split pipeline (kNN kernel → index-rebuilt mask) exactly: the packed
    keys are recomputed bit-identically (kernels/keys.py)."""
    from samble_tpu.kernels.knn import knn_pallas
    from samble_tpu.kernels.n2p import _n2p_pallas_fwd, _n2p_fused_pallas_fwd
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(4)
    heads, n, hd, kk = 4, 128, 32, 8
    q = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, n, 16)), jnp.float32)
    xn = nbr.knn_normalized(x)
    scale = float(1.0 / np.sqrt(hd // heads))

    idx = knn_pallas(xn, xn, kk, interpret=True)[1]
    want = _n2p_pallas_fwd(q, k, v, idx, heads, scale, negate, subtract_v,
                           interpret=True)
    got, kth = _n2p_fused_pallas_fwd(q, k, v, xn, heads, scale, negate,
                                     subtract_v, kk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
    assert kth.shape == (2, n)


@pytest.mark.parametrize("n", [128, 192])
def test_knn_fused_n2p_backward_matches_autodiff(n):
    """Backward of the kNN-fused kernel (threshold mask from the saved kth
    key) vs jax.grad of the dense reference over the same neighbor sets."""
    from samble_tpu.kernels.knn import knn_pallas
    from samble_tpu.kernels.n2p import (
        _n2p_fused_fwd, _n2p_fused_bwd, n2p_dense_reference,
    )
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(5)
    heads, hd, kk = 4, 32, 8
    q = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, n, hd)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, n, 16)), jnp.float32)
    xn = nbr.knn_normalized(x)
    scale = float(1.0 / np.sqrt(hd // heads))

    idx = knn_pallas(xn, xn, kk, interpret=True)[1]
    _, vjp = jax.vjp(
        lambda q, k, v: n2p_dense_reference(q, k, v, idx, heads, scale,
                                            False, True),
        q, k, v,
    )
    want = vjp(g)
    out, res = _n2p_fused_fwd(q, k, v, xn, heads, scale, False, True, kk,
                              interpret=True)
    got = _n2p_fused_bwd(heads, scale, False, True, kk, True, res, g)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )
    assert np.all(np.asarray(got[3]) == 0.0)  # xn carries no gradient
