#!/usr/bin/env python
"""Decompose YOLOv10-S 640^2 train-step time on the real chip:
forward / forward+loss / grad(loss) / grad(dummy) / full step.
Identifies whether the assigner+loss, the backward pass, or the optimizer
dominates (VERDICT round-2 item #2's profile note)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()  # initialize the axon backend BEFORE importing optax — importing
# optax first hangs/kills the plugin registration on this box (same reason
# bench.py imports optax lazily)

import optax

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.train.loss import v10_detect_loss
from yolov10_3d_tpu.train.state import TrainState, make_train_step

import sys
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HW, M = 640, 20


from _bench_util import timed  # noqa: E402 (chained, RTT-cancelled)


def main():
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml")
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32))
    batch = {
        "img": img,
        "gt_labels": jnp.asarray(rng.integers(0, spec.nc, (B, M)), jnp.int32),
        "gt_bboxes": jnp.asarray(
            np.stack([rng.uniform(0.3, 0.7, (B, M)), rng.uniform(0.3, 0.7, (B, M)),
                      rng.uniform(0.05, 0.2, (B, M)), rng.uniform(0.05, 0.2, (B, M))], -1
                     ).astype(np.float32)),
        "mask_gt": jnp.ones((B, M), bool),
    }
    params, bs = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd_train(params, x):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs}, x.astype(jnp.bfloat16),
            train=True, mutable=["batch_stats"],
        )
        return jax.tree.map(lambda t: t.sum(), preds)

    @jax.jit
    def fwd_loss(params, batch):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs},
            batch["img"].astype(jnp.bfloat16), train=True, mutable=["batch_stats"],
        )
        total, _ = v10_detect_loss(preds, batch, nc=spec.nc, strides=spec.strides,
                                   gains=(7.5, 0.5, 1.5), one2many_topk=10)
        return total

    def _gnorm(g):
        return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in jax.tree.leaves(g))

    @jax.jit
    def grad_loss(params, batch):
        return _gnorm(jax.grad(lambda p: fwd_loss.__wrapped__(p, batch))(params))

    @jax.jit
    def grad_dummy(params, batch):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": bs},
                batch["img"].astype(jnp.bfloat16), train=True, mutable=["batch_stats"],
            )
            leaves = jax.tree.leaves(preds)
            return sum(l.astype(jnp.float32).sum() for l in leaves)
        return _gnorm(jax.grad(f)(params))

    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(0.01, momentum=0.937, nesterov=True))
    step = jax.jit(make_train_step(model, tx, nc=spec.nc, strides=spec.strides,
                                   compute_dtype=jnp.bfloat16))
    state = TrainState.create(variables, tx)

    t_fwd = timed(fwd_train, params, img)
    t_fwd_loss = timed(fwd_loss, params, batch)
    t_grad_dummy = timed(grad_dummy, params, batch)
    t_grad = timed(grad_loss, params, batch)
    state, m = step(state, batch)
    float(m["loss"])  # scalar-readback fence
    t0 = time.perf_counter()
    for _ in range(8):
        state, m = step(state, batch)
    float(m["loss"])
    t_step = (time.perf_counter() - t0) / 8

    print(f"B={B} @ {HW}^2")
    print(f"forward (train mode, bf16):      {t_fwd*1e3:8.1f} ms  {B/t_fwd:8.0f} img/s")
    print(f"forward + dual loss:             {t_fwd_loss*1e3:8.1f} ms  {B/t_fwd_loss:8.0f} img/s")
    print(f"grad of dummy sum (fwd+bwd):     {t_grad_dummy*1e3:8.1f} ms  {B/t_grad_dummy:8.0f} img/s")
    print(f"grad of dual loss:               {t_grad*1e3:8.1f} ms  {B/t_grad:8.0f} img/s")
    print(f"full train step (+opt,EMA,BN):   {t_step*1e3:8.1f} ms  {B/t_step:8.0f} img/s")
    print(f"  -> loss adds {(t_fwd_loss-t_fwd)*1e3:.1f} ms fwd; "
          f"{(t_grad-t_grad_dummy)*1e3:.1f} ms in bwd; "
          f"opt/EMA add {(t_step-t_grad)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
