"""Measured-latency harness (replaces the reference's cycle-count simulator
as the source of truth for schedule fitness and reported numbers —
vTCAD/code/simulator.py returns simulated cycles; here we time real runs)."""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import numpy as np


def time_fn(
    fn: Callable,
    *args,
    iters: int = 50,
    warmup: int = 2,
    **kwargs,
) -> Tuple[float, float]:
    """Median and best wall-clock seconds per call of ``fn(*args)``.

    The first call compiles; ``warmup`` calls are discarded.  Each timed call
    blocks on the result, so dispatch overhead is included (it is part of the
    real serving latency).
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), float(np.min(times))


def time_fn_pipelined(
    fn: Callable,
    *args,
    iters: int = 100,
    warmup: int = 5,
    reps: int = 5,
    **kwargs,
) -> float:
    """Seconds per call with dispatches pipelined: ``iters`` async launches,
    one block at the end.  This amortises host->device dispatch latency (large
    and jittery through the axon tunnel) and measures device execution
    throughput — the right number for kernel comparisons.  Returns the best
    of ``reps`` repetitions of the pipelined loop."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
