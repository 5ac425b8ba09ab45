#!/usr/bin/env python
"""E2E serving shootout for the int8 conv scopes (round-5, VERDICT r4 #1).

Builds the exact serving twin bench.py measures (fast_eval + SPD-packed
stem, bf16 activations, B=128) and times the full forward + decode + top-k
under: (a) bf16 (no int8), (b) set_int8_mode(scope="k3") — the round-2 +4%
opt-in, (c) scope="k3deep" — k3 plus the deep-stage (<=20x20) 1x1s where
the round-5 B=128 chained campaign measured the XLA int8 flow at 3.2x bf16.

Methodology: bench.py's min-of-iters with per-call scalar readback and RTT
subtraction (the only reliable fence through the axon tunnel).

Run: python tools/exp_int8_scope.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.nn.modules import set_int8_mode  # noqa: E402
from yolov10_3d_tpu.ops.postprocess import v10_detections  # noqa: E402
from yolov10_3d_tpu.ops.spd_stem import space_to_depth  # noqa: E402

B, HW = 128, 640


def measure(scope):
    """img/s for one scope (None = bf16)."""
    set_int8_mode(scope is not None, scope=scope or "k3")
    try:
        model, spec = build_model(
            "yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml",
            fast_eval=True, spd_stem="packed",
        )
        x0 = jnp.zeros((1, HW // 2, HW // 2, 12), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x0, train=False
        )
        variables = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            variables,
        )

        @jax.jit
        def fwd(variables, x):
            feats = model.apply(variables, x, train=False)["one2one"]
            det = v10_detections(feats, spec.strides, spec.nc, max_det=300)
            return det["scores"].sum()

        trivial = jax.jit(lambda v, x: x[0, 0, 0, 0].astype(jnp.float32))
        rng = np.random.default_rng(0)
        x_raw = rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)
        x = space_to_depth(jnp.asarray(x_raw)).astype(jnp.bfloat16)

        def timed(fn, iters=16):
            float(fn(variables, x))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(fn(variables, x))
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts))

        t = max(timed(fwd) - timed(trivial), 1e-6)
        return B / t, t * 1e3
    finally:
        set_int8_mode(False)


def main():
    for name, scope in (("bf16", None), ("int8 k3", "k3"), ("int8 k3deep", "k3deep")):
        ips, ms = measure(scope)
        print(f"  {name:<14} {ms:7.2f} ms/batch128   {ips:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
