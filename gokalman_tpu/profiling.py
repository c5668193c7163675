"""Tracing and timing harness.

The reference has no profiling at all (SURVEY.md §5: only Go test
timing).  This provides the TPU-native equivalents: jax.profiler traces
viewable in XProf/TensorBoard, and a steady-state timing helper used by
bench.py-style kernel measurements.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with profiling.trace("/tmp/trace"): ...`"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup: int = 1, iters: int = 3):
    """Best-of-N steady-state wall time of a jitted function.

    Returns (best_seconds, last_output).  Compiles/warms up first so
    the measurement excludes tracing and compilation.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def backend_watchdog(timeout_s: float, name: str = "bench") -> None:
    """Guard against the wedged tunneled backend, whose failure mode
    hangs even jax.devices() (backend registration): probe device
    acquisition from a daemon thread and exit(2) with a diagnostic
    after `timeout_s` instead of stalling the caller forever.
    Shared by bench.py and bench_od.py (BENCH_BACKEND_TIMEOUT)."""
    import os
    import sys
    import threading

    import jax

    done = threading.Event()

    def probe():
        try:
            jax.devices()
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(
            f"{name}: backend unreachable after {timeout_s:.0f}s "
            "(axon tunnel wedged?) — aborting instead of hanging",
            file=sys.stderr,
            flush=True,
        )
        os._exit(2)
