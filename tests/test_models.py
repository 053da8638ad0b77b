"""Shape / init / gradient smoke tests for the cls and seg models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu.models import ClsModel, SegModel
from tests._tiny_configs import N, tiny_cls_config, tiny_seg_config

B = 2


def _init_and_apply(model, *args, train=True):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = model.init(rngs, *args)
    mutable = ["batch_stats", "bin_stats"] if train else []
    out, updates = model.apply(
        variables, *args,
        rngs={"dropout": jax.random.key(3), "sampling": jax.random.key(4)},
        mutable=mutable,
    ) if train else (model.apply(variables, *args, rngs={"sampling": jax.random.key(4)}), {})
    return variables, out, updates


def test_cls_model_forward_shapes():
    cfg = tiny_cls_config()
    model = ClsModel(cfg=cfg, num_classes=40, train=True)
    x = jax.random.normal(jax.random.key(5), (B, N, 3))
    variables, (logits, aux), updates = _init_and_apply(model, x)
    assert logits.shape == (B, 40)
    assert len(aux["downsample"]) == 2
    assert aux["downsample"][0]["idx"].shape == (B, 32)
    assert aux["downsample"][1]["idx"].shape == (B, 16)
    assert "bin_stats" in variables
    assert "batch_stats" in updates
    # dynamic boundary state updated in train mode
    bs = jax.tree_util.tree_leaves(updates["bin_stats"])
    assert any(np.asarray(b).size for b in bs)


def test_cls_model_eval_mode_is_deterministic():
    cfg = tiny_cls_config(sample_mode="topk")
    x = jax.random.normal(jax.random.key(6), (B, N, 3))
    model = ClsModel(cfg=cfg, train=False)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = ClsModel(cfg=cfg, train=True).init(rngs, x)
    out1, _ = model.apply(variables, x, rngs={"sampling": jax.random.key(7)})
    out2, _ = model.apply(variables, x, rngs={"sampling": jax.random.key(8)})
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_cls_model_gradients_finite():
    cfg = tiny_cls_config()
    model = ClsModel(cfg=cfg, train=True)
    x = jax.random.normal(jax.random.key(9), (B, N, 3))
    labels = jnp.array([3, 7])
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = model.init(rngs, x)

    def loss_fn(params):
        (logits, aux), _ = model.apply(
            {**variables, "params": params}, x,
            rngs={"dropout": jax.random.key(3), "sampling": jax.random.key(4)},
            mutable=["batch_stats", "bin_stats"],
        )
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # bin tokens must receive gradient (they only learn through the
    # bin-weight / ortho path)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    token_grads = [g for p, g in flat if "bin_tokens" in str(p)]
    assert token_grads and any(float(jnp.abs(g).max()) > 0 for g in token_grads)


@pytest.mark.parametrize("us_which", ["interpolation", "crossA"])
def test_seg_model_forward_shapes(us_which):
    cfg = tiny_seg_config(us_which=us_which)
    model = SegModel(cfg=cfg, num_parts=50, train=True)
    x = jax.random.normal(jax.random.key(10), (B, N, 3))
    cat = jax.nn.one_hot(jnp.array([2, 5]), 16)
    variables, (logits, aux), updates = _init_and_apply(model, x, cat)
    assert logits.shape == (B, N, 50)
    assert aux["trans"].shape == (B, 3, 3)
    assert len(aux["downsample"]) == 2


def test_seg_model_selfa_upsample():
    # selfA needs the dropped complement → pair it with the 'global' sampler
    cfg = tiny_seg_config(us_which="selfA", ds_which="global", stn=False)
    cfg.feature_learning_block.downsample.idx_mode = ["col_sum", "col_sum"]
    model = SegModel(cfg=cfg, num_parts=50, train=True)
    x = jax.random.normal(jax.random.key(11), (B, N, 3))
    cat = jax.nn.one_hot(jnp.array([0, 1]), 16)
    variables, (logits, aux), _ = _init_and_apply(model, x, cat)
    assert logits.shape == (B, N, 50)


@pytest.mark.parametrize("ds_which", ["global_carve", "local", "global"])
def test_cls_model_other_downsamplers(ds_which):
    cfg = tiny_cls_config(ds_which=ds_which)
    if ds_which == "local":
        cfg.feature_learning_block.downsample.idx_mode = ["local_std", "local_std"]
    elif ds_which == "global":
        cfg.feature_learning_block.downsample.idx_mode = ["col_sum", "col_sum"]
    model = ClsModel(cfg=cfg, train=True)
    x = jax.random.normal(jax.random.key(12), (B, N, 3))
    variables, (logits, aux), _ = _init_and_apply(model, x)
    assert logits.shape == (B, 40)
