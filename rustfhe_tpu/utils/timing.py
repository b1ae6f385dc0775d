"""Timing / profiling helpers.

The analogue of the reference's ``timeit!`` macro (``utils/src/macros.rs:3-13``)
plus JAX-native profiling: device-synchronized wall timing and an optional
``jax.profiler`` trace context for per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def timeit(label: str, result_holder: dict | None = None, sync=None):
    """Print ``label: <micros> us`` around a block (macros.rs:3-13 flavor).

    ``sync``: optional array/pytree to ``block_until_ready`` before stopping
    the clock (device work is async; without it you time dispatch only).
    """
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[label] = dt
    print(f"{label}: {dt * 1e6:.0f} us")


def time_fn(fn, *args, iters: int = 3, warmup: int = 1):
    """Best-of-N device-synchronized timing of ``fn(*args)``; returns
    (best_seconds, last_result)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context: view with TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
