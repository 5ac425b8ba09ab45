#!/usr/bin/env python
"""Does the space-to-depth rewrite of stride-2 convs speed up TRAINING?

Hypothesis (r3 perf campaign): model bwd is 2.5x fwd (137.8 vs 55.1 ms at
B=128); stride-2 convs backward's grad-of-input lowers to base-dilated
transposed convs — a classically slow TPU path. spd_stem="all" rewrites every
dense k3/s2 conv as 2x2 space-to-depth + k2/s1 (exact math, same params), so
the input-grad is a plain s1 conv grad.

Measures fwd / fwd+bwd of the train-mode model for: baseline, spd stem-only,
spd all.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from _bench_util import gnorm, timed  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HW = 640


def bench(tag, spd):
    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml", spd_stem=spd
    )
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    params, bs = variables["params"], variables["batch_stats"]
    img = jax.random.uniform(jax.random.PRNGKey(1), (B, HW, HW, 3), jnp.bfloat16)

    def psum(t):
        return sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(t))

    @jax.jit
    def fwd(params, x):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return psum(preds)

    @jax.jit
    def grad(params, x):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return psum(preds)
        return gnorm(jax.grad(f)(params))

    tf = timed(fwd, params, img)
    tg = timed(grad, params, img)
    print(f"{tag:12s} fwd {tf*1e3:7.1f} ms   fwd+bwd {tg*1e3:7.1f} ms   "
          f"({B/tg:5.0f} img/s fwd+bwd)", flush=True)
    return tf, tg


if __name__ == "__main__":
    print(f"B={B} @ {HW}^2, train-mode BN, bf16")
    bench("baseline", False)
    bench("spd stem", True)
    bench("spd all", "all")
