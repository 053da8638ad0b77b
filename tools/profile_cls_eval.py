"""Whole-step accounting of the PRIMARY bench config (1024-pt cls eval).

VERDICT round-2, item 4: the kernel-level roofline memo (docs/kernels.md)
shows individual Pallas kernels at 80-85% of their selection-pass roofline,
but nothing accounted for the *whole step* — how much of the batch time is
fused kernels at roofline vs. XLA glue (convs/BN/top-k/head) vs. dispatch.

This tool times every module of the primary forward in isolation
(chained-dispatch harness, the only trustworthy one on the tunnelled TPU)
at its real shapes, tags each with its XLA cost-analysis FLOPs and HBM
bytes, and prints:

  component | ms | % of full | roofline ms (max of MXU-bound, HBM-bound) |
  % of roofline achieved

The residual (full − Σ components) is inter-module glue + measurement
overlap error.  Run on an otherwise-idle TPU:

    python tools/profile_cls_eval.py [--bs 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from samble_tpu.config import load_config
from samble_tpu.models import ClsModel
from samble_tpu.models.factories import make_attention_layer, make_downsample
from samble_tpu.nn.common import Conv1x1, PointBatchNorm, leaky_relu
from samble_tpu.nn.embedding import EdgeConv
from samble_tpu.utils.profiling import timeit_chained

N = 1024
M = [512, 256]
DTYPE = jnp.bfloat16
PEAK_BF16 = 197e12  # v5e MXU, bf16
HBM_BW = 819e9  # v5e HBM bytes/sec


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


def _cost(fn, *args):
    """(flops, hbm_bytes) from the compiled executable's cost analysis."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)), float(
            cost.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def time_eval(module, example_args, tag, results, bs, extra_rngs=("sampling",)):
    """Forward-only chained timing + roofline tagging of one module."""
    rngs = {"params": jax.random.key(0)}
    for name in extra_rngs:
        rngs[name] = jax.random.key(2)
    variables = jax.jit(module.init)(rngs, *example_args)
    apply_rngs = {k: jax.random.key(3) for k in extra_rngs}
    rest = example_args[1:]

    def fwd(x):
        out = module.apply(variables, x, *rest, rngs=apply_rngs)
        if isinstance(out, tuple):
            out = out[0]
        # tiny summary so the chain forces full materialization
        return jnp.sum(out.astype(jnp.float32)) * 1e-6

    x0 = jax.device_put(example_args[0])
    dt = timeit_chained(fwd, x0, iters=30)
    flops, bytes_ = _cost(fwd, x0)
    t_mxu = flops / PEAK_BF16
    t_hbm = bytes_ / HBM_BW
    roof = max(t_mxu, t_hbm)
    results[tag] = {
        "ms": dt * 1e3,
        "flops_G": flops / 1e9,
        "hbm_MB": bytes_ / 1e6,
        "roof_ms": roof * 1e3,
        "roof_pct": 100.0 * roof / dt if dt > 0 else 0.0,
        "bound": "MXU" if t_mxu >= t_hbm else "HBM",
    }
    print(f"{tag:>24s}: {dt * 1e3:7.2f} ms   roof {roof * 1e3:6.2f} ms "
          f"({results[tag]['roof_pct']:5.1f}% of {results[tag]['bound']}-bound "
          f"speed of light)")
    return dt


def main():
    global N, M
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--n", type=int, default=None,
                    help="points per cloud (default 1024; e.g. 4096 for the "
                         "high-res config — M scales to [n//2, n//4])")
    args = ap.parse_args()
    bs = args.bs
    if args.n:
        N = args.n
        M = [N // 2, N // 4]

    cfg = _cfg()
    blk = cfg.feature_learning_block
    rng = np.random.default_rng(0)
    results = {}

    pts = rng.normal(size=(bs, N, 3)).astype(np.float32)
    feat = lambda n, c=128: rng.normal(size=(bs, n, c)).astype(np.float32)
    xyz = lambda n: rng.normal(size=(bs, n, 3)).astype(np.float32)

    # --- full forward (same harness as bench.py's primary) ---
    model = ClsModel(cfg=cfg, num_classes=40, train=False, dtype=DTYPE)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)}, pts
    )

    def full_fwd(x):
        logits, _ = model.apply(variables, x, rngs={"sampling": jax.random.key(3)})
        return jnp.sum(logits) * 1e-6

    x0 = jax.device_put(pts)
    full = timeit_chained(full_fwd, x0, iters=30)
    f_flops, f_bytes = _cost(full_fwd, x0)
    print(f"{'FULL eval forward':>24s}: {full * 1e3:7.2f} ms   "
          f"({bs / full:.1f} clouds/s, {f_flops / 1e9:.1f} GF, "
          f"{f_bytes / 1e6:.0f} MB)")
    results["full"] = {"ms": full * 1e3, "flops_G": f_flops / 1e9,
                       "hbm_MB": f_bytes / 1e6}

    # --- components at their real shapes (eval mode) ---
    ec_kwargs = dict(group_type=blk.embedding.group_type[0], train=False,
                     dtype=DTYPE)
    time_eval(
        EdgeConv(k=blk.embedding.K[0], conv1_out=blk.embedding.conv1_out[0],
                 conv2_out=blk.embedding.conv2_out[0], **ec_kwargs),
        (pts,), "EdgeConv#0 3ch", results, bs, extra_rngs=())
    time_eval(
        EdgeConv(k=blk.embedding.K[1], conv1_out=blk.embedding.conv1_out[1],
                 conv2_out=blk.embedding.conv2_out[1], **ec_kwargs),
        (feat(N, 64),), "EdgeConv#1 64ch", results, bs, extra_rngs=())

    for i, n in enumerate([N] + M):
        time_eval(make_attention_layer(blk.attention, i, False, DTYPE),
                  (feat(n),), f"N2P#{i} @{n}", results, bs, extra_rngs=())

    for i, n in enumerate([N] + M[:-1]):
        time_eval(make_downsample(blk.downsample, i, False, DTYPE),
                  (feat(n), xyz(n)), f"DownSampleToken#{i} @{n}", results, bs)

    # res links: Conv1x1(128->1024) + global max at each stage
    class ResLink(__import__("flax").linen.Module):
        dtype: object = DTYPE

        @__import__("flax").linen.compact
        def __call__(self, x):
            return jnp.max(Conv1x1(1024, dtype=self.dtype)(x), axis=1)

    for n in [N] + M:
        time_eval(ResLink(), (feat(n),), f"res-link conv @{n}", results, bs,
                  extra_rngs=())

    # head MLP 3072 -> 1024 -> 256 -> 40 (BN in eval mode)
    import flax.linen as nn

    class Head(nn.Module):
        dtype: object = DTYPE

        @nn.compact
        def __call__(self, h):
            h = nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = PointBatchNorm(use_running_average=True, dtype=self.dtype)(h)
            h = leaky_relu(h)
            h = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = PointBatchNorm(use_running_average=True, dtype=self.dtype)(h)
            h = leaky_relu(h)
            return nn.Dense(40, param_dtype=jnp.float32)(h.astype(jnp.float32))

    time_eval(Head(), (rng.normal(size=(bs, 3072)).astype(np.float32),),
              "head MLP 3072->40", results, bs, extra_rngs=())

    # --- summary table ---
    comp = {k: v for k, v in results.items() if k != "full"}
    total = sum(v["ms"] for v in comp.values())
    print("\n| component | ms | % of full | roofline ms | % of roofline | bound |")
    print("|---|---|---|---|---|---|")
    for k, v in sorted(comp.items(), key=lambda kv: -kv[1]["ms"]):
        print(f"| {k} | {v['ms']:.2f} | {100 * v['ms'] / results['full']['ms']:.1f}% "
              f"| {v['roof_ms']:.2f} | {v['roof_pct']:.0f}% | {v['bound']} |")
    resid = results["full"]["ms"] - total
    print(f"| glue / overlap residual | {resid:.2f} "
          f"| {100 * resid / results['full']['ms']:.1f}% | — | — | — |")
    print(f"\nfull {results['full']['ms']:.2f} ms; components sum {total:.2f} ms")

    import json

    out = os.path.join("/tmp", f"profile_cls_eval_bs{bs}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"written: {out}")


if __name__ == "__main__":
    main()
