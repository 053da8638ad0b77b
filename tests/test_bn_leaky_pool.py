"""bn_leaky_pool: pooled BN→LeakyReLU without the normalized slab.

``max leaky(BN(z)) = leaky(s·(max z if s>0 else min z) + b)`` because BN is
a per-channel affine and leaky is strictly increasing.  These tests pin the
rewrite against the composed flax chain — forward (train + eval), running
statistics updates, and gradients — including negative BN scales, which
exercise the min branch.
"""

import os
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samble_tpu.nn.common import PointBatchNorm, bn_leaky_pool, leaky_relu


class Composed(nn.Module):
    train: bool = True
    mean_pool: bool = False

    @nn.compact
    def __call__(self, z):
        y = PointBatchNorm(use_running_average=not self.train)(z)
        y = leaky_relu(y)
        if self.mean_pool:
            return jnp.max(y, axis=1), jnp.mean(y, axis=1)
        return jnp.max(y, axis=1)


class Pooled(nn.Module):
    train: bool = True
    mean_pool: bool = False

    @nn.compact
    def __call__(self, z):
        bn = PointBatchNorm(use_running_average=not self.train)
        return bn_leaky_pool(
            lambda um=None: bn(raw_features=z.shape[-1], update_moments=um),
            z, axis=1, train=self.train, mean_pool=self.mean_pool,
        )


def _variables(c=16, negate_some=True):
    """A variable tree with mixed-sign scales and non-trivial stats."""
    rng = np.random.default_rng(0)
    scale = rng.normal(size=c).astype(np.float32)
    if negate_some:
        scale[::3] = -np.abs(scale[::3]) - 0.1  # exercise the min branch
    return {
        "params": {"PointBatchNorm_0": {"BatchNorm_0": {
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(rng.normal(size=c).astype(np.float32)),
        }}},
        "batch_stats": {"PointBatchNorm_0": {"BatchNorm_0": {
            "mean": jnp.asarray(rng.normal(size=c).astype(np.float32)),
            "var": jnp.asarray(
                np.abs(rng.normal(size=c)).astype(np.float32) + 0.5
            ),
        }}},
    }


def _z(b=4, n=64, c=16):
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))


def test_train_forward_and_stats_match():
    z = _z()
    v = _variables()
    for mean_pool in (False, True):
        comp = Composed(train=True, mean_pool=mean_pool)
        pool = Pooled(train=True, mean_pool=mean_pool)
        oc, vc = comp.apply(v, z, mutable=["batch_stats"])
        op, vp = pool.apply(v, z, mutable=["batch_stats"])
        oc = oc if mean_pool else (oc,)
        op = op if mean_pool else (op,)
        for a, b in zip(oc, op):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        # running statistics updated identically
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            vc["batch_stats"], vp["batch_stats"],
        )


def test_eval_forward_matches():
    z = _z()
    v = _variables()
    oc = Composed(train=False).apply(v, z)
    op = Pooled(train=False).apply(v, z)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(op),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    z = _z()
    v = _variables()

    def loss(mod, z, v):
        out, _ = mod.apply(v, z, mutable=["batch_stats"])
        out = out if isinstance(out, jnp.ndarray) else out[0]
        return jnp.sum(jnp.sin(out))

    for mean_pool in (False,):
        comp = Composed(train=True, mean_pool=mean_pool)
        pool = Pooled(train=True, mean_pool=mean_pool)
        gc_z, gc_p = jax.grad(lambda z, p: loss(comp, z, p), argnums=(0, 1))(
            z, v
        )
        gp_z, gp_p = jax.grad(lambda z, p: loss(pool, z, p), argnums=(0, 1))(
            z, v
        )
        np.testing.assert_allclose(np.asarray(gc_z), np.asarray(gp_z),
                                   rtol=1e-4, atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            gc_p["params"], gp_p["params"],
        )


def test_bf16_matches_composed_bf16():
    """Under AMP the pooled path must stay in the composed path's family."""
    z = _z().astype(jnp.bfloat16)
    v = _variables(negate_some=False)

    class ComposedB(nn.Module):
        @nn.compact
        def __call__(self, z):
            y = PointBatchNorm(use_running_average=False,
                               dtype=jnp.bfloat16)(z)
            y = leaky_relu(y)
            return jnp.max(y, axis=1)

    class PooledB(nn.Module):
        @nn.compact
        def __call__(self, z):
            bn = PointBatchNorm(use_running_average=False,
                                dtype=jnp.bfloat16)
            return bn_leaky_pool(
                lambda um=None: bn(raw_features=z.shape[-1],
                                   update_moments=um),
                z, axis=1, train=True,
            )

    oc, _ = ComposedB().apply(v, z, mutable=["batch_stats"])
    op, _ = PooledB().apply(v, z, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(oc, np.float32), np.asarray(op, np.float32),
        rtol=2e-2, atol=2e-2,
    )
