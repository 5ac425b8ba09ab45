#!/usr/bin/env python
"""E2E 3D serving shootout for the int8 conv scopes (round 5).

Same methodology as tools/exp_int8_scope.py but on the flagship
YOLOv10-S-3D serving twin at the KITTI resolution (384x1280, fast_eval +
sparse top-k eval — the exact config bench.py's 3D inference line times).
The v10Detect3d head is 16 branches x [Conv3x3 -> Conv3x3 -> 1x1] x 3
scales (~4x the backbone's FLOPs), i.e. k3-dominated — the scope where the
chained campaign measured int8 winning 1.28-1.81x — so the 3D path should
gain MORE from int8 than the 2D one (+8.1%).

Run: python tools/exp_int8_scope3d.py
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
from yolov10_3d_tpu.ops.postprocess import (  # noqa: E402
    decode_detect3d, v10_3d_postprocess,
)

B, HW = 128, (384, 1280)


def measure(scope):
    set_int8_mode(scope is not None, scope=scope or "k3")
    try:
        model, spec = build_model(
            "yolov10_3d_tpu/cfg/models/v10-3D/yolov10s_3D.yaml",
            fast_eval=True, sparse_eval=True,
        )
        x0 = jnp.zeros((1, *HW, 3), jnp.float32)
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
            preds = decode_detect3d(feats, spec.strides, spec.nc)
            _, scores, _ = v10_3d_postprocess(preds, 50, spec.nc)
            return scores.sum()

        trivial = jax.jit(lambda v, x: x[0, 0, 0, 0].astype(jnp.float32))
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.uniform(0, 1, (B, *HW, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)

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
        print(f"  {name:<14} {ms:7.2f} ms/batch{B}   {ips:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
