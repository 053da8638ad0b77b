"""Shared STN/EdgeConv#0 front (seg train path).

One fused kNN-gather on raw xyz feeds both the STN's grouped front and
EdgeConv#0's neighbor term (gather is per-point row selection, so
gather(x @ W) == gather(x) @ W).  Documented deviation vs the reference
(models/seg_model.py:181-190): EdgeConv#0's neighbor graph is built on the
PRE-transform xyz in train mode.  At init the STN is exactly the identity
(zero-kernel / identity-bias head, models/embedding.py:73-74), so the
shared and unshared paths must agree bitwise-tightly there — that is the
gate this file pins, plus parameter-tree equality (checkpoints must
interchange) and gradient flow through the shared slab.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samble_tpu.config import load_config
from samble_tpu.models import SegModel

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cfg():
    return load_config(
        os.path.join(ROOT, "configs", "default.yaml"),
        dataset_path=os.path.join(ROOT, "configs", "datasets", "shapenet.yaml"),
        usr_config_path=os.path.join(ROOT, "configs", "seg.yaml"),
        cli_overrides=[
            "train.dataloader.selected_points=256",
            "feature_learning_block.downsample.M=[128,64]",
        ],
    )


def _models(cfg):
    shared = SegModel(cfg=cfg, train=True, share_stn_front=True)
    unshared = SegModel(cfg=cfg, train=True, share_stn_front=False)
    return shared, unshared


def _data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    cat = jnp.zeros((2, 16), jnp.float32).at[:, 3].set(1.0)
    return x, cat


def test_param_tree_identical(cfg):
    """Checkpoint compatibility: sharing must not move or rename any param."""
    shared, unshared = _models(cfg)
    x, cat = _data()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    vs = jax.eval_shape(lambda: shared.init(rngs, x, cat))
    vu = jax.eval_shape(lambda: unshared.init(rngs, x, cat))
    ps = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vs)
    pu = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vu)
    assert ps == pu


def test_identity_stn_agreement(cfg):
    """At init trans == I, so the raw-xyz graph IS the post-transform graph
    and the shared/unshared paths must agree tightly up to the first
    stochastic sampler.  (The FINAL outputs legitimately diverge: the
    shared front reorders float contractions by ~1e-5, and the Gumbel
    sampler in DownSampleToken flips near-tie picks on any perturbation —
    the same reason the Pallas parity gate compares decisions, not
    sampler internals, docs/kernels.md.)  So the gate here is the
    embedding stack: STN output, EdgeConv#0, EdgeConv#1, and the sampler's
    input statistics."""
    shared, unshared = _models(cfg)
    x, cat = _data()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = shared.init(rngs, x, cat)
    apply_rngs = {"dropout": jax.random.key(1), "sampling": jax.random.key(2)}
    (ls, auxs), vs = shared.apply(
        variables, x, cat, rngs=apply_rngs,
        mutable=["batch_stats", "bin_stats", "intermediates"],
        capture_intermediates=True,
    )
    (lu, auxu), vu = unshared.apply(
        variables, x, cat, rngs=apply_rngs,
        mutable=["batch_stats", "bin_stats", "intermediates"],
        capture_intermediates=True,
    )
    np.testing.assert_allclose(
        np.asarray(auxs["trans"]), np.eye(3)[None].repeat(2, 0), atol=0
    )
    blk_s = vs["intermediates"]["SegFeatureBlock_0"]
    blk_u = vu["intermediates"]["SegFeatureBlock_0"]
    for mod in ("EdgeConv_0", "EdgeConv_1"):
        np.testing.assert_allclose(
            np.asarray(blk_s[mod]["__call__"][0]),
            np.asarray(blk_u[mod]["__call__"][0]),
            rtol=2e-4, atol=2e-4, err_msg=mod,
        )
    # the sampler's input stats (bin probabilities) agree to float noise
    aux_ds0_s = blk_s["DownSampleToken_0"]["__call__"][0][3]
    aux_ds0_u = blk_u["DownSampleToken_0"]["__call__"][0][3]
    np.testing.assert_allclose(
        np.asarray(aux_ds0_s["bin_prob"]),
        np.asarray(aux_ds0_u["bin_prob"]),
        rtol=5e-3, atol=5e-3,
    )


def test_gradients_flow_and_finite(cfg):
    """Gradients reach the STN and EdgeConv#0 params through the shared slab
    (the folded-transform einsum must carry d/d trans as well)."""
    shared, _ = _models(cfg)
    x, cat = _data()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = shared.init(rngs, x, cat)
    params = variables["params"]
    # the STN head Dense is zero-kernel at init, which blocks all gradient
    # into the STN front (d loss/d front = dDense/d input = kernel = 0);
    # perturb it so the front's conv can receive signal
    import flax.core

    params = flax.core.unfreeze(params)
    head = params["STN_0"]["Dense_0"]
    head["kernel"] = 0.01 * jax.random.normal(
        jax.random.key(9), head["kernel"].shape, head["kernel"].dtype
    )
    others = {k: v for k, v in variables.items() if k != "params"}
    apply_rngs = {"dropout": jax.random.key(1), "sampling": jax.random.key(2)}

    def loss(p, x):
        (logits, aux), _ = shared.apply(
            {"params": p, **others}, x, cat, rngs=apply_rngs,
            mutable=list(others.keys()),
        )
        # pull on the STN matrix too so its Dense head sees a cotangent
        return jnp.sum(logits ** 2) * 1e-3 + jnp.sum(aux["trans"] ** 2)

    grads, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert bool(jnp.all(jnp.isfinite(gx)))
    # the STN front's first conv and EdgeConv#0's conv1 must receive signal
    stn_g = grads["STN_0"]["ConvBNLeaky_0"]["Conv1x1_0"]["Dense_0"]["kernel"]
    ec0_g = grads["SegFeatureBlock_0"]["EdgeConv_0"]["conv1_kernel"]
    assert float(jnp.abs(stn_g).sum()) > 0
    assert float(jnp.abs(ec0_g).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0
