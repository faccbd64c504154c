"""Profiling / tracing hooks (SURVEY.md §5: absent in the reference).

Thin wrappers over ``jax.profiler`` so inversion runs can be traced in
TensorBoard / Perfetto, plus a simple iteration-throughput timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace of the enclosed block::

        with trace("/tmp/specinv-trace"):
            griffin_lim(mag, max_iter=100, verbose=False).block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # named region inside a trace


class Throughput:
    """Measure sustained iterations/second of a jitted run.

    >>> tp = Throughput()
    >>> y = tp.measure(lambda: griffin_lim(mag, max_iter=1000, tol=0.0,
    ...                                    verbose=False), iters=1000)
    >>> tp.iters_per_sec
    """

    def __init__(self):
        self.iters_per_sec = None
        self.seconds = None

    def measure(self, fn, iters: int, warmup: bool = True):
        import numpy as np

        if warmup:
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
        t0 = time.perf_counter()
        out = fn()
        # Force a host readback: on tunneled backends (axon)
        # block_until_ready can return before remote execution completes.
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        self.seconds = time.perf_counter() - t0
        self.iters_per_sec = iters / self.seconds
        return out
