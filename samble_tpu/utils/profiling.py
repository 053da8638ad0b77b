"""Profiling helpers: step timing, FLOPs, XLA trace capture.

Reference has none (ptflops is pinned but never imported, SURVEY.md §5).
TPU-native equivalents: ``jax.profiler`` traces and compiler cost analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax


def flops_estimate(fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOPs of ``fn(*args)`` from XLA cost analysis (None if unavailable)."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns a list per computation
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def bytes_estimate(fn: Callable, *args, **kwargs) -> Optional[float]:
    """HBM bytes accessed by ``fn(*args)`` from XLA cost analysis (None if
    unavailable).  Together with the measured step time this yields the
    whole-step bandwidth utilization — the binding roofline for this
    selection-bound model family (docs/kernels.md "Roofline memo"),
    which MFU alone misrepresents."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("bytes accessed", 0.0))
    except Exception:
        return None


def session_calibration(iters: int = 20) -> dict:
    """Time two fixed reference kernels — a bf16 (4096,4096)² matmul (MXU
    bound) and a 256 MB f32 triad (HBM bound) — so every bench record
    carries the chip's *delivered* speed at measurement time.  This box's
    throughput drifts ±25% on an hour scale (bench.py docstring); these
    two numbers let cross-session comparisons be deflated by the actual
    hardware state instead of guessed at."""
    import jax.numpy as jnp
    import numpy as np

    n = 4096
    a = jax.device_put(
        np.random.default_rng(0).normal(size=(n, n)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            x, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    t_mm = timeit_chained(mm, a, iters=iters)
    mm_tflops = 2 * n * n * n / t_mm / 1e12

    m = 64 * 1024 * 1024  # 64M f32 = 256 MB
    v = jax.device_put(np.ones(m, np.float32))

    def triad(x):
        return x * 1.000001 + 0.5  # read + write: 2 × 256 MB per call

    t_tr = timeit_chained(triad, v, iters=iters)
    triad_gbps = 2 * m * 4 / t_tr / 1e9
    return {
        "matmul_ms": round(t_mm * 1e3, 3),
        "matmul_tflops": round(mm_tflops, 1),
        "triad_ms": round(t_tr * 1e3, 3),
        "triad_gbps": round(triad_gbps, 1),
    }


@contextlib.contextmanager
def step_timer(sync: Any = None):
    """Wall-clock a block, blocking on ``sync`` (an array) at exit."""
    t0 = time.perf_counter()
    holder = {}
    yield holder
    if sync is not None:
        jax.block_until_ready(sync)
    holder["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit_chained(fn_out, x0, iters: int = 10, warmup: int = 2,
                   consts: tuple = ()) -> float:
    """Trustworthy TPU timing on this stack: chain iterations (each call's
    input is perturbed by a summary of the previous output, so no call can
    be elided or served from a cache) and fence with ONE host readback of a
    tiny pre-materialized buffer.  Plain dispatch+block_until_ready loops
    mis-measure on the tunnelled backend (see bench.py docstring).

    :param fn_out: ``(x, *consts) -> output array`` (pure, jit-compatible)
    :param x0: initial input array (on device)
    :param consts: additional device arrays, threaded as real jit arguments.
        Do NOT close over large arrays in ``fn_out`` instead — closure
        constants are serialized into the remote-compile request on the
        tunnelled backend and trip its size limit (HTTP 413).
    :returns: seconds per call
    """
    import time

    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def step(x, *cs):
        out = fn_out(x, *cs)
        s = jnp.mean(out.astype(jnp.float32))
        return x + 1e-6 * s, s.reshape(1)

    c = x0
    for _ in range(warmup):
        c, s = step(c, *consts)
        np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        c, s = step(c, *consts)
    np.asarray(s)
    return (time.perf_counter() - t0) / iters
