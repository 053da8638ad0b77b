"""Component-level timing of the ModelNet cls TRAIN step (fwd+bwd).

VERDICT round-3, item 3: the primary config trains at 848 clouds/s
(bs=64, N=1024) vs 2400+ eval — this tool attributes the train-step time
to its modules (loss→grad through each, with real train-mode mutables) so
the harvest lands where the time is, mirroring tools/profile_seg_train.py.

Run on an otherwise-idle TPU:  python tools/profile_cls_train.py [--bs 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time as _time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from samble_tpu.config import load_config
from samble_tpu.models import ClsModel
from samble_tpu.models.factories import make_attention_layer, make_downsample
from samble_tpu.nn.embedding import EdgeConv
from samble_tpu.utils.profiling import timeit_chained

N = 1024
M = [512, 256]
DTYPE = jnp.bfloat16


def _cfg():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return load_config(
        os.path.join(root, "configs", "default.yaml"),
        dataset_path=os.path.join(root, "configs", "datasets", "modelnet.yaml"),
        usr_config_path=os.path.join(root, "configs", "cls.yaml"),
        cli_overrides=[
            f"train.dataloader.selected_points={N}",
            f"feature_learning_block.downsample.M={M}",
        ],
    )


def time_grad(module, example_args, tag, bs, iters=8,
              extra_rngs=("sampling",)):
    """Seconds per fwd+bwd of ``module`` (grad wrt params AND first input)."""
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

    dt = timeit_chained(fn, jax.device_put(example_args[0]), iters=iters)
    print(f"{tag:>28s}: {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    args = ap.parse_args()
    bs = args.bs

    cfg = _cfg()
    blk = cfg.feature_learning_block
    rng = np.random.default_rng(0)
    results = {}

    pts = rng.normal(size=(bs, N, 3)).astype(np.float32)
    f128 = lambda n: rng.normal(size=(bs, n, 128)).astype(np.float32)
    xyz = lambda n: rng.normal(size=(bs, n, 3)).astype(np.float32)

    # --- full step (same harness as bench.py) ---
    from samble_tpu.data import make_batch_augment
    from samble_tpu.train.schedules import make_optimizer
    from samble_tpu.train.state import create_train_state
    from samble_tpu.train.step import make_train_step

    model = ClsModel(cfg=cfg, num_classes=40, train=True, dtype=DTYPE)
    tx = make_optimizer(cfg.train, steps_per_epoch=100)
    example = (np.zeros((bs, N, 3), np.float32),)
    state = create_train_state(model, example, tx, jax.random.key(0))
    augment = make_batch_augment(cfg.train.dataloader.data_augmentation)
    step = make_train_step(model, cfg, "cls", 40, augment_fn=augment,
                           donate=False)
    label = jax.device_put(rng.integers(0, 40, bs).astype(np.int32))
    ptsd = jax.device_put(pts)
    for _ in range(2):
        state, out = step(state, (ptsd, label), jax.random.key(7))
        np.asarray(out["loss"])
    t0 = _time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, out = step(state, (ptsd, label), jax.random.key(7))
    np.asarray(out["loss"])
    full = (_time.perf_counter() - t0) / iters
    print(f"{'FULL train step':>28s}: {full * 1e3:8.2f} ms   "
          f"({bs / full:.1f} clouds/s)", flush=True)
    results["full_step"] = full

    # --- components (train mode, fwd+bwd) ---
    ec0 = EdgeConv(k=32, group_type="center_diff", conv1_out=64, conv2_out=64,
                   train=True, dtype=DTYPE)
    results["edgeconv0"] = time_grad(ec0, (pts,), "EdgeConv#0 3ch @1024", bs)
    ec1 = EdgeConv(k=32, group_type="center_diff", conv1_out=64, conv2_out=64,
                   train=True, dtype=DTYPE)
    results["edgeconv1"] = time_grad(
        ec1, (rng.normal(size=(bs, N, 64)).astype(np.float32),),
        "EdgeConv#1 64ch @1024", bs)

    for n in (1024, 512, 256):
        m = make_attention_layer(blk.attention, 0, True, DTYPE)
        results[f"n2p_{n}"] = time_grad(m, (f128(n),), f"N2P @{n}", bs)

    for i, n in ((0, 1024), (1, 512)):
        m = make_downsample(blk.downsample, i, True, DTYPE)
        results[f"ds{i}"] = time_grad(m, (f128(n), xyz(n)),
                                      f"DownSampleToken#{i} @{n}->{M[i]}", bs)

    # --- res-link convs (Conv1024 + BN + leaky + max over points) ---
    import flax.linen as nn

    from samble_tpu.nn.common import Conv1x1, PointBatchNorm, leaky_relu

    class ResLink(nn.Module):
        # matches models/cls_model.py:64,84 — conv + global max, no BN
        @nn.compact
        def __call__(self, x):
            return jnp.max(Conv1x1(1024, dtype=DTYPE)(x), axis=1)

    for n in (1024, 512, 256):
        results[f"res_{n}"] = time_grad(
            ResLink(), (f128(n),), f"res-link conv @{n}", bs,
            extra_rngs=())

    class HeadMLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(1024, dtype=DTYPE)(x)
            h = PointBatchNorm(use_running_average=False, dtype=DTYPE)(h)
            h = leaky_relu(h)
            h = nn.Dropout(0.5, deterministic=False)(h)
            h = nn.Dense(256, dtype=DTYPE)(h)
            h = PointBatchNorm(use_running_average=False, dtype=DTYPE)(h)
            h = leaky_relu(h)
            h = nn.Dropout(0.5, deterministic=False)(h)
            return nn.Dense(40, dtype=DTYPE)(h)

    results["head"] = time_grad(
        HeadMLP(), (rng.normal(size=(bs, 3072)).astype(np.float32),),
        "head MLP 3072->40", bs, extra_rngs=())

    known = sum(v for k, v in results.items() if k != "full_step")
    print(f"{'sum of components':>28s}: {known * 1e3:8.2f} ms "
          f"(full {results['full_step'] * 1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
