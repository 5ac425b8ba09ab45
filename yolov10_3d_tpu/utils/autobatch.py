"""Automatic batch-size search (reference: utils/autobatch.py — binary search
of the largest batch under a CUDA memory fraction; here: under the TPU's HBM
budget using XLA's compile-time memory analysis, no OOM-probing needed)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def device_memory_bytes(default: int = 16 * 2**30) -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_limit", default))
    except Exception:
        return default


def check_train_batch_size(
    step_fn: Callable,
    make_batch: Callable[[int], dict],
    state,
    fraction: float = 0.8,
    max_batch: int = 256,
) -> int:
    """Largest power-of-two batch whose compiled train step fits in
    fraction * HBM, measured via compiled.memory_analysis() (compile-only,
    never OOMs a live chip)."""
    budget = device_memory_bytes() * fraction
    best = 1
    b = 2
    while b <= max_batch:
        try:
            lowered = jax.jit(step_fn).lower(state, make_batch(b))
            ma = lowered.compile().memory_analysis()
            used = (
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
            )
            if used > budget:
                break
            best = b
        except Exception:
            break
        b *= 2
    return best
