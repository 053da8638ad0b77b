"""Module-level wiring tests for the fused train-mode EdgeConv path.

tests/test_edgeconv_train_kernel.py proves the kernel's math (values and
all seven gradients vs jax.grad of the slab chain).  These tests prove the
*wiring*: EdgeConv / STN with ``impl='fused'`` in train mode (interpret
kernels on CPU) must match ``impl='gather'`` on the identical parameter
tree — forward values, every parameter gradient, AND the running-stat
updates written to ``batch_stats`` (the RawBN aliasing contract,
samble_tpu/nn/common.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from samble_tpu.nn.embedding import STN, EdgeConv


def _tree_close(a, b, rtol, atol, prefix=""):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg=f"{prefix}{jax.tree_util.keystr(path)}",
        )


def test_edgeconv_fused_train_matches_gather():
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)

    kw = dict(k=8, group_type="center_diff", conv1_out=16, conv2_out=24,
              train=True)
    mod_g = EdgeConv(impl="gather", **kw)
    mod_f = EdgeConv(impl="fused", **kw)
    vs = mod_g.init({"params": jax.random.key(7)}, x)

    # non-trivial BN state so the running-update check is meaningful, and
    # mixed-sign γ so the kernel's min-branch (monotone-decreasing BN2)
    # is exercised through the module wiring
    def perturb(path, v):
        if v.ndim != 1:
            return v
        r = jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        v = v + 0.1 * r
        if jax.tree_util.keystr(path).endswith("['scale']"):
            v = v * jnp.where(r % 3 == 0, -1.0, 1.0)
        return v

    vs = jax.tree_util.tree_map_with_path(perturb, vs)

    def make_loss(mod):
        def loss(p):
            out, mut = mod.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x,
                mutable=["batch_stats"],
            )
            return jnp.sum(out**2) * 1e-3, (out, mut["batch_stats"])
        return loss

    (lg, (og, sg)), gg = jax.value_and_grad(
        make_loss(mod_g), has_aux=True)(vs["params"])
    (lf, (of, sf)), gf = jax.value_and_grad(
        make_loss(mod_f), has_aux=True)(vs["params"])

    np.testing.assert_allclose(np.asarray(of), np.asarray(og),
                               rtol=2e-4, atol=2e-5)
    _tree_close(gf, gg, rtol=5e-4, atol=5e-5, prefix="grad ")
    _tree_close(sf, sg, rtol=1e-4, atol=1e-6, prefix="batch_stats ")
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5)


def test_edgeconv_fused_train_other_group_types():
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
    for gt in ("center_neighbor", "diff", "neighbor"):
        kw = dict(k=6, group_type=gt, conv1_out=8, conv2_out=12, train=True)
        mod_g = EdgeConv(impl="gather", **kw)
        mod_f = EdgeConv(impl="fused", **kw)
        vs = mod_g.init({"params": jax.random.key(3)}, x)

        def make_loss(mod):
            def loss(p):
                out, mut = mod.apply(
                    {"params": p, "batch_stats": vs["batch_stats"]}, x,
                    mutable=["batch_stats"],
                )
                return jnp.sum(out**2) * 1e-3
            return loss

        lg = make_loss(mod_g)(vs["params"])
        lf = make_loss(mod_f)(vs["params"])
        np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5,
                                   err_msg=gt)
        gg = jax.grad(make_loss(mod_g))(vs["params"])
        gf = jax.grad(make_loss(mod_f))(vs["params"])
        _tree_close(gf, gg, rtol=1e-3, atol=1e-4, prefix=f"{gt} grad ")


def test_stn_fused_train_matches_gather():
    rng = np.random.default_rng(43)
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)

    mod_g = STN(k=8, impl="gather", train=True)
    mod_f = STN(k=8, impl="fused", train=True)
    vs = mod_g.init({"params": jax.random.key(11)}, xyz)

    def make_loss(mod):
        def loss(p):
            out, mut = mod.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, xyz,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(5)},
            )
            return jnp.sum(out**2), (out, mut["batch_stats"])
        return loss

    (lg, (og, sg)), gg = jax.value_and_grad(
        make_loss(mod_g), has_aux=True)(vs["params"])
    (lf, (of, sf)), gf = jax.value_and_grad(
        make_loss(mod_f), has_aux=True)(vs["params"])

    np.testing.assert_allclose(np.asarray(of), np.asarray(og),
                               rtol=5e-4, atol=5e-5)
    _tree_close(gf, gg, rtol=2e-3, atol=2e-4, prefix="grad ")
    # downstream BNs (PointBatchNorm_1/2 on the 512/256-d head) see the
    # front's ~1e-5 rounding noise amplified through max-pooling, so their
    # running stats get a looser tolerance than the kernel-updated pair
    _tree_close(sf, sg, rtol=5e-3, atol=5e-4, prefix="batch_stats ")
