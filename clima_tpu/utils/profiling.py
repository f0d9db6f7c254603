"""Tracing / profiling helpers (SURVEY.md section 5: the reference has none).

Wraps jax.profiler so model runs can emit XLA traces viewable in
TensorBoard/Perfetto, plus a simple wall-clock timer for kernel
microbenchmarks (used by bench.py-style roofline checks).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "Timer", "time_fn"]


@contextlib.contextmanager
def trace(logdir: str):
    """Context manager capturing an XLA profiler trace to ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0


def time_fn(fn, *args, n_iter=10, warmup=1):
    """Steady-state seconds/call of a jitted function (device-synchronized)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter
