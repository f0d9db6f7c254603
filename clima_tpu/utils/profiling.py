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


def _sync(out):
    """Synchronize by round-tripping one small output leaf to host.

    ``jax.block_until_ready`` does not reliably synchronize through the TPU
    relay in this environment (see CLAUDE.md); a device_get of any result
    leaf is the dependable barrier. Fetch the first leaf only — it is
    usually small (fluxes, scalars), and one round-trip synchronizes the
    whole dispatch.
    """
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(leaves[0])


def time_fn(fn, *args, n_iter=10, warmup=1):
    """Steady-state seconds/call of a jitted function (device-synchronized).

    Each call is synchronized by a host round-trip of one output leaf
    (~60 ms through the TPU relay), so per-call times below ~100 ms should
    be measured by slope-timing K applications per dispatch instead
    (scripts/roofline.py shows the pattern).
    """
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / n_iter
