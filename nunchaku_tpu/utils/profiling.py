"""Tracing/profiling helpers (aux-subsystem parity, SURVEY.md §5).

The reference wraps every block stage in NVTX ranges (src/FluxModel.cpp:7,
550-755) and ships a latency harness (app/flux.1/t2i/latency.py). The TPU
counterparts: jax.profiler traces (viewable in TensorBoard/Perfetto, with
each Pallas kernel visible by name) and a dispatch-overhead-aware timing
helper (a single jit call through the runtime tunnel carries ~25-50 ms of
fixed overhead on this sandbox, so naive per-call timing lies).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/nunchaku_tpu_trace"):
    """Capture a device trace: with trace(): pipe(...)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # annotate graph regions for the profiler


def time_fn(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median-free steady-state seconds/call with full-completion sync."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _sync(out):
    leaves = jax.tree.leaves(out)
    if leaves:
        # host readback forces completion even through async runtimes
        float(jnp.sum(leaves[0].astype(jnp.float32)))
