"""Tiled P2P / l2-energy attention kernel vs the XLA composition.

The kernel drops the softmax-invariant ‖q_i‖² row term of the l2 energies
(kernels/p2p.py docstring) — mathematically exact, so forward and every
gradient must match the dense (B, H, N, N) XLA path to float tolerance.
Runs in interpret mode on the CPU test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu import ops
from samble_tpu.kernels.p2p import p2p_attention

B, N, H, C, CV = 2, 128, 4, 32, 32
SCALE = 1.0 / np.sqrt(C // H)


def _data(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, C)), dtype)
    k = jnp.asarray(rng.normal(size=(B, N, C)), dtype)
    v = jnp.asarray(rng.normal(size=(B, N, CV)), dtype)
    return q, k, v


def _xla_reference(q, k, v, asm):
    """The dense composition of nn/attention.py:197-209."""
    qh = jnp.moveaxis(q.reshape(B, N, H, C // H), 2, 1)  # (B, H, N, D)
    kh = jnp.moveaxis(k.reshape(B, N, H, C // H), 2, 1)
    vh = jnp.moveaxis(v.reshape(B, N, H, CV // H), 2, 1)
    if asm == "dot":
        energy = jnp.einsum("bhnd,bhmd->bhnm", qh, kh)
    elif asm == "l2":
        energy = -ops.l2_global(qh, kh)
    else:
        energy = ops.l2_global(qh, kh)
    attn = jax.nn.softmax(energy.astype(jnp.float32) * SCALE, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bnhd", attn.astype(q.dtype), vh)
    return out.reshape(B, N, CV)


@pytest.mark.parametrize("asm", ["dot", "l2", "l2+"])
def test_forward_matches(asm):
    q, k, v = _data()
    out_k = p2p_attention(q, k, v, H, float(SCALE), asm, True)
    out_r = _xla_reference(q, k, v, asm)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("asm", ["dot", "l2", "l2+"])
def test_gradients_match(asm):
    q, k, v = _data()
    rng = np.random.default_rng(1)
    wt = jnp.asarray(rng.normal(size=(B, N, CV)).astype(np.float32))

    def loss_k(q, k, v):
        return jnp.sum(p2p_attention(q, k, v, H, float(SCALE), asm, True) * wt)

    def loss_r(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, asm) * wt)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5,
            atol=5e-5 * max(1.0, float(jnp.abs(b).max())), err_msg=name,
        )


def test_bf16_forward():
    q, k, v = _data(jnp.bfloat16)
    out_k = p2p_attention(q, k, v, H, float(SCALE), "l2", True)
    out_r = _xla_reference(q, k, v, "l2")
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_odd_tile_n():
    """N = 192 → 64-row tiles (the _tile_for fallback)."""
    rng = np.random.default_rng(2)
    n = 192
    q = jnp.asarray(rng.normal(size=(B, n, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, n, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, n, CV)).astype(np.float32))
    out_k = p2p_attention(q, k, v, H, float(SCALE), "dot", True)
    qh = jnp.moveaxis(q.reshape(B, n, H, C // H), 2, 1)
    kh = jnp.moveaxis(k.reshape(B, n, H, C // H), 2, 1)
    vh = jnp.moveaxis(v.reshape(B, n, H, CV // H), 2, 1)
    attn = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * SCALE, axis=-1
    )
    out_r = jnp.einsum("bhnm,bhmd->bnhd", attn, vh).reshape(B, n, CV)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("asm", ["dot", "l2"])
def test_p2p_module_pallas_matches_dense(asm, monkeypatch):
    """Point2PointAttention with the tiled kernel forced vs the dense XLA
    branch — same params, train-mode BN stats included."""
    from samble_tpu import kernels
    from samble_tpu.nn.attention import Point2PointAttention

    monkeypatch.setenv("SAMBLE_FORCE_PALLAS", "1")
    kernels.use_pallas.cache_clear()
    try:
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 256, 32)).astype(np.float32))
        mk = lambda impl: Point2PointAttention(
            num_heads=4, asm=asm, q_out=32, k_out=32, v_out=32,
            ff_hidden=64, ff_out=32, impl=impl, train=True,
        )
        v = mk("pallas").init(jax.random.key(0), x)
        out_p, vars_p = mk("pallas").apply(v, x, mutable=["batch_stats"])
        out_d, vars_d = mk("dense").apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                                   rtol=2e-4, atol=2e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            vars_p["batch_stats"], vars_d["batch_stats"],
        )
    finally:
        monkeypatch.delenv("SAMBLE_FORCE_PALLAS", raising=False)
        kernels.use_pallas.cache_clear()
