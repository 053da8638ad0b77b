"""Benchmark: clouds/sec/chip, 1024-pt ModelNet40 classification inference.

The BASELINE.json primary metric.  Runs the flagship SAMBLE (token-bin
downsampler) classifier in eval mode on the real TPU chip, sweeps batch
size, and reports the best sustained throughput as ONE JSON line:

    {"metric": "...", "value": N, "unit": "clouds/sec", "vs_baseline": N}

``vs_baseline`` is relative to the first recorded measurement of this same
framework (the reference publishes no numbers, BASELINE.md) — stored in
REFERENCE_CLOUDS_PER_SEC once round 1 measured it.
"""

import json
import os
import sys
import time

import numpy as np

# Round-1 measured throughput on one TPU v5e chip (this framework, XLA
# path, f32).  Later rounds report speedup vs this anchor.
REFERENCE_CLOUDS_PER_SEC = None  # set after first TPU measurement


def main():
    import jax

    # Remote (tunnelled) compilation is slow (~minutes); persist executables.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from samble_tpu.config import load_config
    from samble_tpu.models import ClsModel

    root = os.path.dirname(os.path.abspath(__file__))
    n_points = 1024
    import jax.numpy as jnp

    cfg = load_config(
        os.path.join(root, "configs", "default.yaml"),
        dataset_path=os.path.join(root, "configs", "datasets", "modelnet.yaml"),
        usr_config_path=os.path.join(root, "configs", "cls.yaml"),
        cli_overrides=[f"train.dataloader.selected_points={n_points}"],
    )
    # serving configuration: bfloat16 compute (set SAMBLE_BENCH_F32=1 for f32)
    dtype = (
        jnp.float32 if os.environ.get("SAMBLE_BENCH_F32") == "1" else jnp.bfloat16
    )
    model_train = ClsModel(cfg=cfg, num_classes=40, train=True, dtype=dtype)
    model_eval = ClsModel(cfg=cfg, num_classes=40, train=False, dtype=dtype)

    rng = np.random.default_rng(0)
    init_points = rng.normal(size=(8, n_points, 3)).astype(np.float32)
    variables = model_train.init(
        {
            "params": jax.random.key(0),
            "dropout": jax.random.key(1),
            "sampling": jax.random.key(2),
        },
        init_points,
    )

    @jax.jit
    def forward(variables, points):
        logits, _ = model_eval.apply(
            variables, points, rngs={"sampling": jax.random.key(3)}
        )
        return logits

    best = 0.0
    best_bs = None
    for bs in (32, 64, 128):
        points = rng.normal(size=(bs, n_points, 3)).astype(np.float32)
        points = jax.device_put(points)
        try:
            # warmup (compile + 2 steady).  Force a host readback per call:
            # on the tunnelled 'axon' backend block_until_ready can resolve
            # before remote execution completes, producing bogus timings.
            for _ in range(3):
                float(np.asarray(forward(variables, points)).sum())
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                float(np.asarray(forward(variables, points)).sum())
            dt = time.perf_counter() - t0
            cps = bs * iters / dt
        except Exception as e:  # OOM at large batch etc.
            print(f"# bs={bs} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(f"# bs={bs}: {cps:.1f} clouds/sec", file=sys.stderr)
        if cps > best:
            best, best_bs = cps, bs

    vs = best / REFERENCE_CLOUDS_PER_SEC if REFERENCE_CLOUDS_PER_SEC else 1.0
    print(
        json.dumps(
            {
                "metric": "modelnet40_cls_1024pt_inference_throughput",
                "value": round(best, 2),
                "unit": "clouds/sec",
                "vs_baseline": round(vs, 3),
                "batch_size": best_bs,
                "dtype": str(dtype.__name__),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
