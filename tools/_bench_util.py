"""Shared timing scaffold for the on-chip profiling tools.

The axon-tunneled TPU needs three things done right (see docs/performance.md):
scalar readback as the only reliable fence, chained iterations to amortize the
~10-25 ms tunnel round trip, and RTT subtraction for the residual. One
implementation here so all tools measure the same way (review finding: four
divergent copies, one of which forgot the RTT cancel entirely)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

_RTT = None


def rtt() -> float:
    """One tunnel round trip: dispatch + scalar readback of a trivial fn."""
    global _RTT
    if _RTT is None:
        _RTT = 0.0
        triv = jax.jit(lambda x: x[0, 0])
        x = jnp.ones((8, 8), jnp.float32)
        float(triv(x))
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            float(triv(x))
            ts.append(time.perf_counter() - t0)
        _RTT = float(np.median(ts))
    return _RTT


def timed(fn, *args, iters: int = 8, subtract_rtt: bool = True) -> float:
    """Mean sec/call over a chain of ``iters`` calls fenced by one scalar
    readback, minus the tunnel RTT. fn's first output leaf must be scalar-
    readable."""
    float(jax.tree.leaves(fn(*args))[0])  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    if subtract_rtt:
        dt -= rtt()
    return dt / iters


def timed_min(fn, *args, iters: int = 8, subtract_rtt: bool = True) -> float:
    """Min-of-iters sec/call with a scalar readback PER call (each call pays
    one RTT, subtracted). Min is the cleanest estimate under tunnel jitter
    for single-dispatch measurements (bench.py's inference methodology)."""
    float(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    best = float(np.min(ts))
    return max(best - rtt(), 0.0) if subtract_rtt else best


def gnorm(g) -> jax.Array:
    """Scalar reduction over a grad pytree (a jit-able fence target)."""
    return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in jax.tree.leaves(g))
