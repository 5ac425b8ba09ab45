#!/usr/bin/env python
"""Decompose the B=128 YOLOv10-S train step (VERDICT r2 #1): where do the
274 ms go? Measures, at the bench's exact config (640^2, bf16 compute):

  1. fwd train-mode, both heads      (the step's forward slice)
  2. fwd + v10 dual loss             (adds assigner/CIoU/DFL forward)
  3. value_and_grad(fwd+loss)        (adds the backward)
  4. full train step                 (adds clip/SGD/EMA + state plumbing)

Differences are attributions. Optionally sweeps batch in argv.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from _bench_util import timed_min as timed  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.train.loss import v10_detect_loss  # noqa: E402
from yolov10_3d_tpu.train.state import TrainState, make_train_step  # noqa: E402

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
    img = jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)).astype(
        jnp.bfloat16
    )
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
    def fwd(params, img):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs}, img, train=True,
            mutable=["batch_stats"],
        )
        return psum(preds)

    @jax.jit
    def fwd_loss(params, batch):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs}, batch["img"], train=True,
            mutable=["batch_stats"],
        )
        total, aux = v10_detect_loss(
            preds, batch, nc=spec.nc, strides=spec.strides
        )
        return total.astype(jnp.float32)

    @jax.jit
    def grad_loss(params, batch):
        g = jax.grad(lambda p: fwd_loss.__wrapped__(p, batch))(params)
        return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in jax.tree.leaves(g))

    t1 = timed(fwd, params, img)
    print(f"B={B} fwd train-mode        : {t1*1e3:7.1f} ms  {B/t1:7.0f} img/s",
          flush=True)
    t2 = timed(fwd_loss, params, batch)
    print(f"B={B} fwd + dual loss       : {t2*1e3:7.1f} ms  (loss fwd +{(t2-t1)*1e3:.1f})",
          flush=True)
    t3 = timed(grad_loss, params, batch)
    print(f"B={B} grad(fwd+loss)        : {t3*1e3:7.1f} ms  (bwd +{(t3-t2)*1e3:.1f}, "
          f"bwd/fwd {(t3-t2)/t1:4.2f}x)", flush=True)

    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(learning_rate=0.01, momentum=0.937, nesterov=True),
    )
    step_fn = jax.jit(
        make_train_step(model, tx, nc=spec.nc, strides=spec.strides,
                        compute_dtype=jnp.bfloat16),
        donate_argnums=0,
    )
    state = TrainState.create(variables, tx)
    state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        float(metrics["loss"])
        ts.append(time.perf_counter() - t0)
    t4 = float(np.min(ts))
    print(f"B={B} full train step       : {t4*1e3:7.1f} ms  {B/t4:7.0f} img/s  "
          f"(opt/EMA/state +{(t4-t3)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
