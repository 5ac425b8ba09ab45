#!/usr/bin/env python
"""Backward-pass attribution for the YOLOv10-S train step (VERDICT r2 item #1).

Ablations (B=64, 640^2, bf16 compute, real chip, scalar-readback timing):
  1. fwd eval-mode  (frozen BN, both heads)     -- the serving-like forward
  2. fwd train-mode (batch-stat BN, both heads) -- what the train step runs
  3. grad, train-mode BN                        -- the full backward baseline
  4. grad, frozen BN                            -- isolates BN-train's fwd+bwd cost
  5. depthwise-conv grad microbench             -- TPU DW-grad suspect
  6. stride-2 conv grad microbench              -- dilated-grad suspect

Each difference attributes wall-time to one mechanism; this is measured
evidence, not cost-model guessing (HLO profilers don't run through the
axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

import flax.linen as nn  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402

B, HW = 64, 640


from _bench_util import timed_min as timed, gnorm  # noqa: E402 (RTT-cancelled)


def main():
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml")
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    params, bs = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def psum(t):
        return sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(t))

    @jax.jit
    def fwd_eval(params, x):
        return psum(model.apply({"params": params, "batch_stats": bs}, x, train=False))

    @jax.jit
    def fwd_train(params, x):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return psum(preds)

    @jax.jit
    def grad_train(params, x):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return psum(preds)
        return gnorm(jax.grad(f)(params))

    @jax.jit
    def grad_frozen(params, x):
        def f(p):
            return psum(model.apply({"params": p, "batch_stats": bs}, x, train=False))
        return gnorm(jax.grad(f)(params))

    t_fe = timed(fwd_eval, params, img)
    print(f"fwd eval-mode BN  : {t_fe*1e3:7.1f} ms  {B/t_fe:7.0f} img/s", flush=True)
    t_ft = timed(fwd_train, params, img)
    print(f"fwd train-mode BN : {t_ft*1e3:7.1f} ms  {B/t_ft:7.0f} img/s", flush=True)
    t_gt = timed(grad_train, params, img)
    print(f"grad train-BN     : {t_gt*1e3:7.1f} ms  {B/t_gt:7.0f} img/s", flush=True)
    t_gf = timed(grad_frozen, params, img)
    print(f"grad frozen-BN    : {t_gf*1e3:7.1f} ms  {B/t_gf:7.0f} img/s", flush=True)
    print(f"-> BN-train adds {(t_ft-t_fe)*1e3:.1f} ms fwd, "
          f"{(t_gt-t_gf)*1e3:.1f} ms fwd+bwd", flush=True)

    # --- microbenches: 8-layer chains with distinct weights (CSE-proof) ---
    def chain_bench(name, mk_layer, shape, n=8):
        class Chain(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(n):
                    x = mk_layer(i)(x)
                return x

        m = Chain()
        x = jnp.ones(shape, jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(lambda t: t.astype(jnp.bfloat16), v)

        fwd = jax.jit(lambda v, x: m.apply(v, x).astype(jnp.float32).sum())
        grd = jax.jit(lambda v, x: gnorm(jax.grad(
            lambda p: m.apply(p, x).astype(jnp.float32).sum())(v)))
        tf = timed(fwd, v, x)
        tg = timed(grd, v, x)
        print(f"{name:28s} fwd {tf*1e3/n:7.2f} ms/layer   "
              f"fwd+bwd {tg*1e3/n:7.2f} ms/layer  (bwd/fwd {tg/tf:4.1f}x)",
              flush=True)

    C = 256
    chain_bench(
        "DWConv k3 @40x40x512",
        lambda i: nn.Conv(512, (3, 3), padding="SAME", feature_group_count=512,
                          use_bias=False, dtype=jnp.bfloat16, name=f"dw{i}"),
        (B, 40, 40, 512),
    )
    chain_bench(
        "DWConv k7 @20x20x512 (RepVGGDW)",
        lambda i: nn.Conv(512, (7, 7), padding="SAME", feature_group_count=512,
                          use_bias=False, dtype=jnp.bfloat16, name=f"dw7{i}"),
        (B, 20, 20, 512),
    )
    chain_bench(
        f"Conv k3 s1 @80x80x{C}",
        lambda i: nn.Conv(C, (3, 3), padding="SAME", use_bias=False,
                          dtype=jnp.bfloat16, name=f"c{i}"),
        (B, 80, 80, C),
    )
    chain_bench(
        "Conv k1 @80x80x256",
        lambda i: nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16,
                          name=f"p{i}"),
        (B, 80, 80, 256),
    )


if __name__ == "__main__":
    main()
