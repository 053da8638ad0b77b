"""Decompose the EdgeConv-family train cost: fused-kNN gather fwd, scatter
bwd, and the XLA slab chain, at cls (B=64, N=1024) and seg (B=32, N=2048)
shapes.  Drives the round-4 harvest: these three pieces are the whole
train-side EdgeConv/STN budget (docs/kernels.md accounting tables).

Run on an idle TPU:  python tools/probe_gather_kernels.py
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

from samble_tpu.kernels.gather import (
    gather_knn_kfirst,
    gather_neighbors_kfirst,
    scatter_neighbors_kfirst,
)
from samble_tpu.kernels.knn import knn_pallas
from samble_tpu.ops import neighbors as nbr
from samble_tpu.utils.profiling import timeit_chained


def probe(b, n, k, c):
    rng = np.random.default_rng(0)
    w = jax.device_put(jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16))
    xyz = jax.device_put(rng.normal(size=(b, n, 3)).astype(np.float32))
    xn = jax.jit(nbr.knn_normalized)(xyz)
    g = jax.device_put(jnp.asarray(rng.normal(size=(b, k, n, c)), jnp.bfloat16))
    idx = jax.jit(
        lambda xn: gather_knn_kfirst(jnp.zeros((b, n, 8), jnp.bfloat16), xn, k)[1]
    )(xn)

    print(f"--- B={b} N={n} K={k} C={c} ---", flush=True)

    def f_gknn(w, xn):
        out, _ = gather_knn_kfirst(w, xn, k)
        return out[:, 0]

    t = timeit_chained(f_gknn, w, iters=10, consts=(xn,))
    print(f"  gather_knn fwd (fused kNN):      {t*1e3:7.2f} ms", flush=True)

    def f_knn(xyz_):
        a, b_ = nbr._normalize_pair(xyz_, xyz_)
        return knn_pallas(a, b_, k)[1].astype(jnp.bfloat16)[:, :, 0]

    t = timeit_chained(f_knn, xyz, iters=10)
    print(f"  standalone kNN kernel:           {t*1e3:7.2f} ms", flush=True)

    def f_gidx(w, idx):
        return gather_neighbors_kfirst(w, idx)[:, 0]

    t = timeit_chained(f_gidx, w, iters=10, consts=(idx,))
    print(f"  gather by idx (chunked):         {t*1e3:7.2f} ms", flush=True)

    def f_scatter(g, idx):
        return scatter_neighbors_kfirst(g, idx, n)

    t = timeit_chained(f_scatter, g, iters=10, consts=(idx,))
    print(f"  scatter (bwd shape):             {t*1e3:7.2f} ms", flush=True)

    # XLA slab chain alone: bn-style moments + affine + leaky + conv + max
    w2 = jax.device_put(rng.normal(size=(c, c)).astype(np.float32))

    def f_slab(g):
        g32 = g.astype(jnp.float32)
        mu = jnp.mean(g32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(g32), axis=(0, 1, 2)) - jnp.square(mu)
        y = (g - mu.astype(g.dtype)) * jax.lax.rsqrt(
            var.astype(g.dtype) + 1e-5
        )
        y = jnp.where(y >= 0, y, 0.2 * y)
        z = y @ w2.astype(g.dtype)
        return jnp.max(z, axis=1)

    def f_slab_grad(g, w2):
        def f_slab(g):
            g32 = g.astype(jnp.float32)
            mu = jnp.mean(g32, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(g32), axis=(0, 1, 2)) - jnp.square(mu)
            y = (g - mu.astype(g.dtype)) * jax.lax.rsqrt(
                var.astype(g.dtype) + 1e-5
            )
            y = jnp.where(y >= 0, y, 0.2 * y)
            z = y @ w2.astype(g.dtype)
            return jnp.max(z, axis=1)

        out, vjp = jax.vjp(f_slab, g)
        (dg,) = vjp(jnp.ones_like(out))
        return dg[:, 0]

    t = timeit_chained(f_slab_grad, g, iters=10, consts=(w2,))
    print(f"  XLA slab chain fwd+bwd:          {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    probe(64, 1024, 32, 64)   # cls train shape
    probe(32, 2048, 32, 64)   # seg train shape
