"""Profiling and timing utilities.

The reference has no profiler integration at all — just hand-rolled
wall-clock buckets in eval-struct (reference: main.py:230-275). Here:
jax.profiler trace capture (xprof-compatible) plus the same style of
named timing buckets, and the chained-loop device timer used by
bench.py (see bench.py for why naive block_until_ready timing is wrong
on lazily-executing remote backends).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nmrgnn_trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class TimingBuckets:
    """Named wall-clock accumulators (eval-struct style)."""

    def __init__(self, *names: str):
        self.ns: Dict[str, int] = {n: 0 for n in names}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.time_ns()
        try:
            yield
        finally:
            self.ns[name] = self.ns.get(name, 0) + time.time_ns() - t0

    def summary(self) -> str:
        return "|".join(f"{k}:{v/1e9:5.2f}s" for k, v in self.ns.items())


def device_time(
    step: Callable[[jnp.ndarray], jnp.ndarray],
    carry0: jnp.ndarray,
    iters: int = 48,
    repeats: int = 5,
) -> float:
    """Seconds per invocation of ``step`` (carry -> carry), measured by
    chaining iterations in one jitted fori_loop ending in a scalar
    readback, at TWO LONG iteration counts (iters//3 and iters); the
    slope removes dispatch/transfer overhead. Both anchors are
    device-time-dominated — an anchor at K=1 (round 1) is dominated by
    the tunnel round trip, whose ~0.5 ms jitter divided by the chain
    length produced +-30% run-to-run swings."""
    from jax import lax

    def chained(c0, k):
        return jnp.sum(lax.fori_loop(0, k, lambda i, c: step(c), c0))

    f = jax.jit(chained, static_argnums=1)

    def timed(k):
        float(f(carry0, k))  # compile + execute once
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(carry0, k))
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo = max(iters // 3, 1)
    t_lo, t_hi = timed(k_lo), timed(iters)
    return max((t_hi - t_lo) / (iters - k_lo), 1e-9)
