"""Component-level timing of the ShapeNet seg train step (fwd+bwd).

The seg train step runs at ~180 clouds/s (BASELINE.md) vs 415 eval — this
tool attributes the step time to its modules so optimization effort lands
where the time is.  Each component is timed in isolation with
``utils.profiling.timeit_chained`` (the only trustworthy harness on the
tunnelled TPU, docs/kernels.md), as loss→grad through the module with the
real train-mode mutables (BN stats, bin stats).

Run on an otherwise-idle TPU:  python tools/profile_seg_train.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from samble_tpu.config import load_config
from samble_tpu.models import SegModel
from samble_tpu.models.factories import (
    make_attention_layer,
    make_downsample,
    make_upsample,
)
from samble_tpu.nn.embedding import EdgeConv, STN
from samble_tpu.utils.profiling import timeit_chained

BS = 32
N = 2048
DTYPE = jnp.bfloat16


def _cfg():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return load_config(
        os.path.join(root, "configs", "default.yaml"),
        dataset_path=os.path.join(root, "configs", "datasets", "shapenet.yaml"),
        usr_config_path=os.path.join(root, "configs", "seg.yaml"),
        cli_overrides=[f"train.dataloader.selected_points={N}"],
    )


def time_grad(module, example_args, tag, iters=8, extra_rngs=("sampling",)):
    """Seconds per fwd+bwd of ``module`` on ``example_args`` (grad wrt params
    AND the first input, matching its position inside the whole-model bwd)."""
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    for name in extra_rngs:
        rngs[name] = jax.random.key(2)
    variables = jax.jit(module.init)(rngs, *example_args)
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}
    mutable = list(others.keys())
    apply_rngs = {k: jax.random.key(3) for k in ("dropout",) + tuple(extra_rngs)}

    rest = example_args[1:]

    def loss(params, x):
        out = module.apply(
            {"params": params, **others}, x, *rest,
            rngs=apply_rngs, mutable=mutable,
        )
        out = out[0] if mutable else out
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def fn(x):
        gp, gx = grad_fn(params, x)
        acc = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(gp):
            acc = acc + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
        return acc + jnp.sum(jnp.abs(gx.astype(jnp.float32)))

    x0 = jax.device_put(example_args[0])
    dt = timeit_chained(fn, x0, iters=iters)
    print(f"{tag:>28s}: {dt * 1e3:8.2f} ms")
    return dt


def main():
    cfg = _cfg()
    blk = cfg.feature_learning_block
    rng = np.random.default_rng(0)
    results = {}

    pts = rng.normal(size=(BS, N, 3)).astype(np.float32)
    f128 = lambda n: rng.normal(size=(BS, n, 128)).astype(np.float32)
    xyz = lambda n: rng.normal(size=(BS, n, 3)).astype(np.float32)

    # --- full step (reference number, same harness as bench.py) ---
    from samble_tpu.data import make_batch_augment
    from samble_tpu.train.schedules import make_optimizer
    from samble_tpu.train.state import create_train_state
    from samble_tpu.train.step import make_train_step

    model = SegModel(cfg=cfg, num_parts=50, train=True, dtype=DTYPE)
    tx = make_optimizer(cfg.train, steps_per_epoch=100)
    example = (np.zeros((BS, N, 3), np.float32), np.zeros((BS, 16), np.float32))
    state = create_train_state(model, example, tx, jax.random.key(0))
    augment = make_batch_augment(cfg.train.dataloader.data_augmentation)
    step = make_train_step(model, cfg, "seg", 50, augment_fn=augment, donate=False)
    seg = jax.device_put(rng.integers(0, 50, (BS, N)).astype(np.int32))
    cat = jax.device_put(rng.integers(0, 16, BS).astype(np.int32))
    ptsd = jax.device_put(pts)
    import time as _time

    for _ in range(2):
        state, out = step(state, (ptsd, seg, cat), jax.random.key(7))
        np.asarray(out["loss"])
    t0 = _time.perf_counter()
    iters = 8
    for _ in range(iters):
        state, out = step(state, (ptsd, seg, cat), jax.random.key(7))
    np.asarray(out["loss"])
    full = (_time.perf_counter() - t0) / iters
    print(f"{'FULL train step':>28s}: {full * 1e3:8.2f} ms   "
          f"({BS / full:.1f} clouds/s)")
    results["full_step"] = full

    # --- components (train mode, fwd+bwd) ---
    results["stn"] = time_grad(STN(train=True), (pts,), "STN @2048")

    ec0 = EdgeConv(k=32, group_type="center_diff", conv1_out=64, conv2_out=64,
                   train=True, dtype=DTYPE)
    results["edgeconv0"] = time_grad(ec0, (pts,), "EdgeConv#0 3ch @2048")
    ec1 = EdgeConv(k=32, group_type="center_diff", conv1_out=64, conv2_out=64,
                   train=True, dtype=DTYPE)
    results["edgeconv1"] = time_grad(
        ec1, (rng.normal(size=(BS, N, 64)).astype(np.float32),),
        "EdgeConv#1 64ch @2048")

    for n in (2048, 1024, 512):
        m = make_attention_layer(blk.attention, 0, True, DTYPE)
        results[f"n2p_{n}"] = time_grad(m, (f128(n),), f"N2P @%d" % n)

    for i, n in ((0, 2048), (1, 1024)):
        m = make_downsample(blk.downsample, i, True, DTYPE)
        results[f"ds{i}"] = time_grad(m, (f128(n), xyz(n)),
                                      f"DownSampleToken#{i} @{n}")

    for j, (n_up, n_sel) in ((0, (1024, 512)), (1, (2048, 1024))):
        m = make_upsample(blk.upsample, j, True, DTYPE)
        idx_sel = np.sort(
            np.argsort(rng.random((BS, n_up)), axis=1)[:, :n_sel], axis=1
        ).astype(np.int32)
        kwargs = dict(
            points_select=f128(n_sel),
            idx_select=idx_sel,
            pcd_up_xyz=xyz(n_up),
            points_select_xyz=xyz(n_sel),
        )
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "sampling": jax.random.key(2)}
        x0 = f128(n_up)
        variables = jax.jit(m.init)(rngs, pcd_up=x0, **kwargs)
        params = variables["params"]
        others = {k: v for k, v in variables.items() if k != "params"}
        mutable = list(others.keys())

        def loss(params, x, _m=m, _others=others, _mut=mutable, _kw=kwargs):
            out = _m.apply({"params": params, **_others}, pcd_up=x, **_kw,
                           rngs={"dropout": jax.random.key(3),
                                 "sampling": jax.random.key(3)},
                           mutable=_mut)
            out = out[0] if _mut else out
            if isinstance(out, tuple):
                out = out[0]
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        grad_fn = jax.grad(loss, argnums=(0, 1))

        def fn(x, _grad_fn=grad_fn, _params=params):
            gp, gx = _grad_fn(_params, x)
            acc = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(gp):
                acc = acc + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
            return acc + jnp.sum(jnp.abs(gx.astype(jnp.float32)))

        dt = timeit_chained(fn, jax.device_put(x0), iters=8)
        print(f"{'UpInterp#%d %d<-%d' % (j, n_up, n_sel):>28s}: {dt * 1e3:8.2f} ms")
        results[f"us{j}"] = dt

    # --- head (Conv1024+BN+global pools + category + MLP to 50) ---
    import flax.linen as nn

    from samble_tpu.nn.common import Conv1x1, PointBatchNorm, leaky_relu

    # mirrors the REAL model head (models/seg_model.py:220-255): pooled BN
    # (bn_leaky_pool) + the split-kernel broadcast-concat conv — profiling
    # the naive reference composition here overstated the head by ~4 ms
    from samble_tpu.models.seg_model import _BroadcastConcatConv1x1
    from samble_tpu.nn.common import bn_leaky_pool

    class Head(nn.Module):
        dtype = DTYPE

        @nn.compact
        def __call__(self, x_tmp, cat_oh):
            h = Conv1x1(1024, dtype=DTYPE)(x_tmp)
            bn_g = PointBatchNorm(use_running_average=False, dtype=DTYPE)
            h_max, h_avg = bn_leaky_pool(
                lambda um=None: bn_g(raw_features=1024, update_moments=um),
                h, axis=1, train=True, mean_pool=True,
            )
            c = Conv1x1(64, dtype=DTYPE)(cat_oh)
            c = PointBatchNorm(use_running_average=False, dtype=DTYPE)(c)
            c = leaky_relu(c)
            g = jnp.concatenate([h_max, h_avg, c], -1)
            h = _BroadcastConcatConv1x1(1024, dtype=DTYPE)(g, x_tmp)
            h = PointBatchNorm(use_running_average=False, dtype=DTYPE)(h)
            h = leaky_relu(h)
            h = nn.Dropout(0.5, deterministic=False)(h)
            h = Conv1x1(256, dtype=DTYPE)(h)
            h = PointBatchNorm(use_running_average=False, dtype=DTYPE)(h)
            h = leaky_relu(h)
            h = nn.Dropout(0.5, deterministic=False)(h)
            return Conv1x1(50)(h.astype(jnp.float32))

    cat_oh = np.eye(16, dtype=np.float32)[rng.integers(0, 16, BS)]
    results["head"] = time_grad(Head(), (f128(N), cat_oh), "seg head @2048",
                                extra_rngs=())

    known = (results["stn"] + results["edgeconv0"] + results["edgeconv1"]
             + results["n2p_2048"] * 2 + results["n2p_1024"] * 2
             + results["n2p_512"] + results["ds0"] + results["ds1"]
             + results["us0"] + results["us1"] + results["head"])
    print(f"{'sum of components':>28s}: {known * 1e3:8.2f} ms   "
          f"(vs full {full * 1e3:.2f}; rest = optimizer+aug+loss+glue)")
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
