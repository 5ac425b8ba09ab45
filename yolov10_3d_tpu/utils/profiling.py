"""Tracing / profiling utilities (reference: utils/ops.py:18 ``Profile``,
tasks.py:152 ``_profile_one_layer``, torch_utils.py get_flops via thop).

TPU equivalents: readback-synchronized wall timers (block_until_ready is
unreliable through tunneled devices — see bench.py), XLA HLO cost analysis for
FLOPs, and jax.profiler trace capture."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


class Profile(contextlib.ContextDecorator):
    """Accumulating wall timer (reference ops.py:18). Use around host-visible
    work; for device work pass a synchronizing function via sync()."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt

    def __str__(self):
        return f"{self.t:.6f}s"


def sync(x) -> None:
    """Force completion of device values via scalar readback."""
    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.asarray(leaves[0]).ravel()[0])


def flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Compiled-graph FLOPs via XLA cost analysis (replaces thop;
    SURVEY.md §2.12: tasks.py:74-77)."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None


def model_info(model, variables, imgsz=640) -> Dict[str, float]:
    """Params + GFLOPs summary (reference torch_utils.py:232 ``model_info``)."""
    n_params = sum(v.size for v in jax.tree.leaves(variables.get("params", {})))
    hw = (imgsz, imgsz) if isinstance(imgsz, int) else tuple(imgsz)
    x = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    f = flops(lambda v, x: model.apply(v, x, train=False), variables, x)
    return {
        "parameters": int(n_params),
        "gflops": round(f / 1e9, 2) if f else None,
    }


def profile_layers(model, variables, x, n: int = 3) -> Dict[str, float]:
    """Per-layer wall-time table (reference tasks.py:152 ``_profile_one_layer``):
    times each layer's captured output readback over n reruns of the jitted
    forward with intermediate capture."""
    fwd = jax.jit(
        lambda v, x: model.apply(
            v, x, train=False,
            capture_intermediates=lambda mdl, name: name == "__call__",
        )[1]["intermediates"]
    )
    inter = fwd(variables, x)
    sync(inter)
    out: Dict[str, float] = {}
    for key in sorted(inter.keys()):
        sub = jax.jit(lambda v, x, k=key: model.apply(
            v, x, train=False,
            capture_intermediates=lambda mdl, name: name == "__call__",
        )[1]["intermediates"][k])
        sync(sub(variables, x))
        t0 = time.perf_counter()
        for _ in range(n):
            sync(sub(variables, x))
        out[key] = (time.perf_counter() - t0) / n * 1e3
    return out
