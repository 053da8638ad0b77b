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
