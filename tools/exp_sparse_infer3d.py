#!/usr/bin/env python
"""Dense vs sparse-top-k 3D head eval throughput on the real chip.

The v10Detect3d regression branches carry ~7/8 of the head's ~106 GFLOP/img
(train-mode census, tools/exp_flops_census.py); the sparse path
(heads3d._sparse_forward_feat, reference head.py:694) evaluates them only at
the top-max_det candidate patches. This measures the end-to-end serving win
at 384x1280 with bf16 params, RTT-cancelled min-of-iters timing (bench.py
scaffold: scalar readback fences; block_until_ready does not, through the
axon tunnel).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.ops.postprocess import (  # noqa: E402
    decode_detect3d,
    v10_3d_postprocess,
)

CFG = "/root/repo/yolov10_3d_tpu/cfg/models/v10-3D/yolov10s_3D.yaml"
HW = (384, 1280)


def build(sparse):
    model, spec = build_model(CFG, fast_eval=True, sparse_eval=sparse)
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
        reg, scores, labels = v10_3d_postprocess(preds, 50, spec.nc)
        return scores.sum()

    return fwd, variables


def timed(fn, variables, x, iters=16):
    float(fn(variables, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(variables, x))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    rng = np.random.default_rng(0)
    trivial = jax.jit(lambda v, x: x[0, 0, 0, 0].astype(jnp.float32))
    for B in (64, 32, 16):
        x = jnp.asarray(
            rng.uniform(0, 1, (B, *HW, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)
        row = [f"B={B:3d}"]
        for sparse in (False, True):
            try:
                fwd, variables = build(sparse)
                t_rtt = timed(trivial, variables, x)
                t = timed(fwd, variables, x) - t_rtt
                ips = B / max(t, 1e-6)
                row.append(
                    f"{'sparse' if sparse else 'dense '}: {t*1e3:7.2f} ms "
                    f"{ips:8.1f} img/s"
                )
            except Exception as e:  # OOM at large B
                row.append(f"{'sparse' if sparse else 'dense '}: {type(e).__name__}")
        print("   ".join(row), flush=True)


if __name__ == "__main__":
    main()
