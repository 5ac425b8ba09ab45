#!/usr/bin/env python
"""Backward-pass ablations for the B=128 train step (VERDICT r3 perf campaign).

Isolates the sources of the bwd/fwd=3.31x excess (ideal ~2x):
  1. grad of model-only (no loss)                 -> model bwd cost
  2. grad of model-only with BN in EVAL mode      -> BN-train bwd chain cost
  3. grad of model+loss (the step's real grad)    -> loss bwd cost
Run from anywhere: sys.path pinned to the repo root.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from _bench_util import timed, gnorm as gn  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.train.loss import v10_detect_loss  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HW = 640


def main():
    model, spec = build_model(
        "/root/repo/yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml"
    )
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    params, bs = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    M = 20
    xywh = np.stack(
        [
            rng.uniform(0.2, 0.8, (B, M)), rng.uniform(0.2, 0.8, (B, M)),
            rng.uniform(0.05, 0.3, (B, M)), rng.uniform(0.05, 0.3, (B, M)),
        ],
        -1,
    ).astype(np.float32)
    batch = {
        "img": img,
        "gt_labels": jnp.asarray(rng.integers(0, spec.nc, (B, M)), jnp.int32),
        "gt_bboxes": jnp.asarray(xywh),
        "mask_gt": jnp.ones((B, M), bool),
    }

    def psum(t):
        return sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(t))

    @jax.jit
    def fwd_train(params, img):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs}, img, train=True,
            mutable=["batch_stats"],
        )
        return psum(preds)

    @jax.jit
    def fwd_eval(params, img):
        preds = model.apply({"params": params, "batch_stats": bs}, img, train=False)
        return psum(preds)

    @jax.jit
    def g_model_train(params, img):
        return gn(jax.grad(lambda p: fwd_train.__wrapped__(p, img))(params))

    @jax.jit
    def g_model_eval(params, img):
        return gn(jax.grad(lambda p: fwd_eval.__wrapped__(p, img))(params))

    @jax.jit
    def g_full(params, batch):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": bs}, batch["img"], train=True,
                mutable=["batch_stats"],
            )
            total, _ = v10_detect_loss(preds, batch, nc=spec.nc, strides=spec.strides)
            return total.astype(jnp.float32)

        return gn(jax.grad(f)(params))

    t_f = timed(fwd_train, params, img)
    print(f"B={B} fwd train-mode        : {t_f*1e3:7.1f} ms", flush=True)
    t_fe = timed(fwd_eval, params, img)
    print(f"B={B} fwd eval-mode         : {t_fe*1e3:7.1f} ms", flush=True)
    t_gm = timed(g_model_train, params, img)
    print(
        f"B={B} grad model (BN train) : {t_gm*1e3:7.1f} ms  "
        f"(bwd {(t_gm-t_f)*1e3:.1f}, bwd/fwd {(t_gm-t_f)/t_f:4.2f}x)",
        flush=True,
    )
    t_ge = timed(g_model_eval, params, img)
    print(
        f"B={B} grad model (BN eval)  : {t_ge*1e3:7.1f} ms  "
        f"(bwd {(t_ge-t_fe)*1e3:.1f}, bwd/fwd {(t_ge-t_fe)/t_fe:4.2f}x)",
        flush=True,
    )
    t_gf = timed(g_full, params, batch)
    print(
        f"B={B} grad model+loss       : {t_gf*1e3:7.1f} ms  "
        f"(loss fwd+bwd adds {(t_gf-t_gm)*1e3:.1f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
