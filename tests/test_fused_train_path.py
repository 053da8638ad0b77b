"""Drive the TPU-fused module paths on CPU (interpret mode).

``SAMBLE_FORCE_PALLAS=1`` + ``interpret_default()`` let the exact module
branches the TPU executes — the fused score kernel, the differentiable
fused attn-rows (train x_ds), the kNN-fused gather — run under the
Pallas interpreter, so the train-path wiring gets CI coverage without a
TPU.  Numerics against the XLA branch are pinned at kernel level
(test_kernels.py); here we pin that the composed TRAIN module runs,
differentiates, and updates its mutable state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samble_tpu import kernels
from samble_tpu.nn.downsample import DownSampleToken


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("SAMBLE_FORCE_PALLAS", "1")
    kernels.use_pallas.cache_clear()
    assert kernels.use_pallas() and kernels.interpret_default()
    yield
    monkeypatch.delenv("SAMBLE_FORCE_PALLAS", raising=False)
    kernels.use_pallas.cache_clear()


def test_ds_token_fused_train_branch_differentiates(force_pallas):
    b, n, c, m = 2, 256, 32, 128
    mod = DownSampleToken(
        m=m, k=8, num_heads=1, asm="dot", idx_mode="sparse_col_sqr",
        num_bins=4, q_out=c, k_out=c, v_out=c, sample_mode="random",
        dynamic_boundaries=True, train=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    variables = mod.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)}, x, xyz
    )

    def loss(params, x):
        (x_ds, idx, _, aux), updates = mod.apply(
            {"params": params, "bin_stats": variables["bin_stats"]},
            x, xyz, rngs={"sampling": jax.random.key(2)},
            mutable=["bin_stats"],
        )
        return jnp.sum(x_ds.astype(jnp.float32) ** 2), (idx, aux, updates)

    (val, (idx, aux, updates)), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True
    )(variables["params"], x)

    assert np.isfinite(float(val)) and float(val) > 0
    assert np.asarray(idx).shape == (b, m)
    # gradients flow through the fused attn-rows custom VJP into BOTH the
    # projections (params) and the input features
    gp, gx = grads
    leaves = jax.tree_util.tree_leaves(gp)
    total = sum(float(jnp.sum(jnp.abs(l.astype(jnp.float32)))) for l in leaves)
    assert np.isfinite(total) and total > 0
    assert float(jnp.sum(jnp.abs(gx))) > 0
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    # the dynamic-boundary EMA state was seeded by this first train step
    assert bool(np.asarray(updates["bin_stats"]["initialized"]))
    assert np.isfinite(
        np.asarray(updates["bin_stats"]["boundaries"])
    ).all()
