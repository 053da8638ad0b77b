"""Decompose the fused score kernel's cost: bisection rounds vs the rest.

The DS-token rows of the primary eval config sit at ~25% of their HBM
roofline (docs/kernels.md) — but the cost model says they are VPU-bound on
the k-th-key *bisection* (16 rounds x ~3 full-width passes per row tile).
This probe times the kernel as a function of ``bisect_rounds`` to get the
per-round cost directly, plus the M=512 row-attention kernel and the
XLA sampler tail, so the task-4 harvest lands where the time is.

Run on an idle TPU:  python tools/probe_score_kernel.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from samble_tpu.kernels import attn_rows as attn_rows_mod
from samble_tpu.kernels import score as score_mod
from samble_tpu.utils.profiling import timeit_chained

B, N, C, D, K, NB, M = 256, 1024, 128, 128, 32, 6, 512


def main():
    rng = np.random.default_rng(0)
    q = jax.device_put(rng.normal(size=(B, N, D)).astype(np.float32))
    k = jax.device_put(rng.normal(size=(B, N + NB, D)).astype(np.float32))
    xn = jax.device_put(rng.normal(size=(B, N, C)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)

    def run(rounds=16, fast=True, tile=256, ebf16=False):
        def f(q, k, xn):
            cm, cf, cc = score_mod.sparse_attention_score_fused(
                q, k, xn, K, float(scale), fast_sel=fast,
                bisect_rounds=rounds, row_tile=tile, energy_bf16=ebf16,
            )
            return cm + cf + cc

        return timeit_chained(f, q, iters=20, consts=(k, xn))

    for tile, ebf in ((256, False), (256, True)):
        t = run(tile=tile, ebf16=ebf)
        print(f"score kernel (tile={tile}, bf16={int(ebf)}):     {t*1e3:7.2f} ms",
              flush=True)

    # row-attention kernel (the other Pallas stage of DS eval)
    qs = jax.device_put(rng.normal(size=(B, M, D)).astype(np.float32))
    v = jax.device_put(rng.normal(size=(B, N + NB, D)).astype(np.float32))

    from samble_tpu.kernels.attn_rows import attn_rows_pallas

    def g(qs, k, v):
        return attn_rows_pallas(qs, k, v, float(scale))

    print(f"attn_rows eval kernel:              {timeit_chained(g, qs, iters=20, consts=(k, v))*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
