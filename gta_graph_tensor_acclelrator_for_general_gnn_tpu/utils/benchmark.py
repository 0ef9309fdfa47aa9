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
    one block at the end.

    CAUTION (axon tunnel): ``jax.block_until_ready`` does NOT await device
    completion there, so this measures the *dispatch* rate, not device time.
    Use :func:`time_layer_device` for honest per-iteration latency through
    the tunnel; this function remains correct on normal JAX backends."""
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


def time_layer_device(
    apply: Callable,
    params,
    g,
    x,
    *,
    k_small: int = 50,
    k_big: int = 1050,
    reps: int = 1,
    target_s: float = None,
) -> float:
    """Honest per-iteration seconds for ``apply(params, g, x) -> y`` where y
    broadcasts back to x's shape/dtype (square layers).

    The iteration loop runs ON DEVICE (lax.fori_loop inside one jit), so one
    execution performs k applications; a 4-byte readback forces completion;
    the slope between two loop counts cancels every constant overhead
    (compile, dispatch, tunnel RTT, readback).  This is the only reliable
    timing through the axon tunnel, where per-execution overhead is
    ~0.3-8 s and block_until_ready does not await completion.

    ``target_s``: when set, SELF-CALIBRATE the loop span instead of using
    ``k_big``: a pilot slope (k=8 vs 24) estimates the per-iteration cost,
    then the span is chosen so the measured window is ~``target_s`` seconds
    (clamped to [100, 16000] iterations).  The loop count becomes a DEVICE
    scalar so one compiled program serves every k — fixed-count measurements
    (k<=550 slope windows) mis-measure up to 4x in either direction on fast
    layers while a fixed large count is unaffordable on slow ones; this
    keeps the window honest at every scale for one compile.
    """
    import jax.numpy as jnp

    # lowered programs expose their graph-data captures (tile/dense arrays,
    # GBs on large graphs) so they ride as jit ARGUMENTS here instead of
    # being inlined as HLO constants (which the remote compiler rejects
    # past ~100 MB) — fold them into g, which is already an argument
    cap = getattr(apply, "captures", None)
    if cap is not None:
        inner = apply.inner
        g = (g, cap)

        def apply(params, gc, xx, _inner=inner):
            return _inner(params, gc[0], xx, gc[1])

    def back_to_x(y, x):
        """Feed y back as the next x (pad/slice widths for non-square layers;
        the fixup is negligible next to the layer itself)."""
        y = y.astype(x.dtype)
        if y.shape == x.shape:
            return y
        w = min(y.shape[1], x.shape[1])
        return jnp.zeros_like(x).at[:, :w].set(y[: x.shape[0], :w])

    if target_s is not None:
        def fn(params, g, x, k):
            def body(i, h):
                return back_to_x(apply(params, g, h), x)
            return jax.lax.fori_loop(0, k, body, x)
        f = jax.jit(fn)

        def run(k):
            kk = jnp.asarray(k, jnp.int32)
            t0 = time.perf_counter()
            float(jnp.sum(f(params, g, x, kk)))
            return time.perf_counter() - t0

        run(8), run(24)       # compile once + settle the tunnel mode
        est = max(min((run(24) - run(8)) / 16 for _ in range(2)), 1e-9)
        span = int(min(max(target_s / est, 100), 16000))
        best = float("inf")
        for _ in range(max(reps, 1)):
            t_small = run(k_small)
            t_big = run(k_small + span)
            best = min(best, (t_big - t_small) / span)
        return max(best, 1e-12)

    def repeat(k):
        def fn(params, g, x):
            def body(i, h):
                return back_to_x(apply(params, g, h), x)
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(fn)

    f_small, f_big = repeat(k_small), repeat(k_big)
    # compile + sync both (first syncs also flip the tunnel into its
    # deterministic per-call mode, making the two timed runs comparable)
    float(jnp.sum(f_small(params, g, x)))
    float(jnp.sum(f_big(params, g, x)))
    best = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        float(jnp.sum(f_small(params, g, x)))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(f_big(params, g, x)))
        t_big = time.perf_counter() - t0
        best = min(best, (t_big - t_small) / (k_big - k_small))
    return max(best, 1e-12)
