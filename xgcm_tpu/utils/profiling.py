"""Profiling and micro-benchmark helpers.

The reference has no in-library tracing/benchmarking at all (SURVEY.md §5:
dask graph visualisation is its only inspection tool).  Here we provide the
TPU-native equivalents: a chained-execution timer that measures true device
throughput (immune to per-dispatch host/tunnel latency), and a thin wrapper
over ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["device_time", "throughput", "trace"]


def device_time(
    fn: Callable[..., jax.Array],
    *args,
    iters: int = 30,
    chain_eps: float = 1e-20,
) -> float:
    """Seconds per execution of ``fn(*args)`` on the device.

    ``iters`` applications are chained inside one jitted ``fori_loop`` (each
    iteration's first argument is perturbed by the previous output), so one
    dispatch covers all iterations and per-call RPC latency cancels out.
    ``fn`` must map arrays -> one array broadcastable against its first
    argument.
    """

    @jax.jit
    def run(first, *rest):
        def body(_, x):
            out = fn(x, *rest)
            return x + jnp.asarray(chain_eps, x.dtype) * out
        return jnp.sum(jax.lax.fori_loop(0, iters, body, first))

    float(run(*args))  # compile + sync
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def throughput(
    fn: Callable[..., jax.Array], *args, points: Optional[int] = None, **kw
) -> Dict[str, float]:
    """Gridpoints/second of ``fn`` (points defaults to the first arg's size)."""
    secs = device_time(fn, *args, **kw)
    n = points if points is not None else args[0].size
    return {"seconds_per_iter": secs, "points_per_second": n / secs}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/xgcm_tpu_trace"):
    """Capture a ``jax.profiler`` trace around a block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
