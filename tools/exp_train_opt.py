#!/usr/bin/env python
"""Train-step optimization experiments (VERDICT r2 #1): time the full
YOLOv10-S 640^2 bf16 train step under candidate levers, vs the r2 baseline
274 ms @ B=128 (466 img/s).

Usage: exp_train_opt.py MODE [BATCH]
  MODE in {base, remat, spd, spd_remat, flat, flat_remat, ...} — "remat"/"spd"
  toggle the model rewrite; "flat" wraps the optimizer in optax.flatten (one
  fused update over a single concatenated vector instead of ~300 per-tensor
  kernels).
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

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.train.state import TrainState, make_train_step  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "base"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
HW = 640


def main():
    kw = {}
    if "remat" in MODE:
        kw["remat"] = True
    if "spd" in MODE:
        kw["spd_stem"] = "all"
    model, spec = build_model(
        "/root/repo/yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml", **kw
    )
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    rng = np.random.default_rng(0)
    M = 20
    xywh = np.stack(
        [
            rng.uniform(0.2, 0.8, (B, M)), rng.uniform(0.2, 0.8, (B, M)),
            rng.uniform(0.05, 0.3, (B, M)), rng.uniform(0.05, 0.3, (B, M)),
        ],
        -1,
    ).astype(np.float32)
    batch = {
        "img": jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)),
        "gt_labels": jnp.asarray(rng.integers(0, spec.nc, (B, M)), jnp.int32),
        "gt_bboxes": jnp.asarray(xywh),
        "mask_gt": jnp.ones((B, M), bool),
    }
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(learning_rate=0.01, momentum=0.937, nesterov=True),
    )
    if "flat" in MODE:
        tx = optax.flatten(tx)
    step_fn = jax.jit(
        make_train_step(model, tx, nc=spec.nc, strides=spec.strides,
                        compute_dtype=jnp.bfloat16),
        donate_argnums=0,
    )
    state = TrainState.create(variables, tx)
    t0 = time.time()
    state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    print(f"[{MODE} B={B}] compile+first step: {time.time()-t0:.0f}s", flush=True)
    for _ in range(2):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"[{MODE} B={B}] step {dt*1e3:7.1f} ms   {B/dt:7.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
