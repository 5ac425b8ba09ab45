"""Latency/throughput benchmarking (reference: utils/benchmarks.py:44).

Measures the jitted forward+decode at several batch sizes with per-call host
readback and reports the fixed-overhead-cancelling marginal throughput (see
bench.py for why plain block_until_ready timing is unreliable on tunneled
devices)."""

from __future__ import annotations

import time
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np


def benchmark(
    model_or_facade,
    imgsz: Union[int, tuple] = 640,
    batches=(1, 16, 64),
    iters: int = 10,
    dtype=jnp.bfloat16,
    **_,
) -> Dict[str, float]:
    from ..ops.postprocess import v10_detections

    facade = model_or_facade
    model, spec, variables = facade.model, facade.spec, facade.variables
    hw = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
    variables = jax.tree.map(
        lambda v: v.astype(dtype) if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
        variables,
    )

    @jax.jit
    def fwd(variables, x):
        feats = model.apply(variables, x, train=False)["one2one"]
        det = v10_detections(feats, spec.strides, spec.nc, max_det=300)
        return det["scores"].sum()

    rng = np.random.default_rng(0)
    out = {}
    times = {}
    for b in batches:
        x = jnp.asarray(
            rng.uniform(0, 1, (b, hw[0], hw[1], 3)).astype(np.float32)
        ).astype(dtype)
        float(fwd(variables, x))  # compile+warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fwd(variables, x))
            ts.append(time.perf_counter() - t0)
        times[b] = float(np.median(ts))
        out[f"latency_ms_b{b}"] = times[b] * 1e3
        out[f"imgs_per_sec_b{b}"] = b / times[b]
    bs = sorted(times)
    if len(bs) >= 2:
        b1, b2 = bs[0], bs[-1]
        out["marginal_imgs_per_sec"] = (b2 - b1) / max(times[b2] - times[b1], 1e-9)
    return out
