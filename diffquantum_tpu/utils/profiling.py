"""Tracing / profiling helpers.

The reference has no profiling (SURVEY.md §5 — one unused ``time.time()``
vestige, `/root/reference/sim_plain.py:124`). Here: ``block_until_ready``-
bracketed wall timers and an XLA trace context for the TPU profiler.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def timed(fn: Callable, *args, n_warmup: int = 2, n_runs: int = 10,
          **kw) -> dict:
    """Median/p10/p90 wall latency of ``fn(*args)`` with device sync."""
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return {
        "median_s": float(np.median(ts)),
        "p10_s": float(np.percentile(ts, 10)),
        "p90_s": float(np.percentile(ts, 90)),
        "n_runs": n_runs,
    }


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto.

    Usage::

        with xla_trace("/tmp/trace"):
            jax.block_until_ready(step(x))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str, logger=None):
    """Simple labelled wall-clock block; logs via ``logger`` if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    msg = f"[{label}] {dt * 1e3:.2f} ms"
    if logger is not None:
        logger.write_text_aux(msg)
    else:
        print(msg)
