#!/usr/bin/env python
"""3D train-step attribution (VERDICT r2 #2): where do the 160.9 ms/step go
at B=32 384x1280? Slices: model fwd (train), model fwd+bwd, + 3D loss,
full train step. Compare per-pixel efficiency with the 2D step
(tools/exp_bwd_ablate.py)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from _bench_util import timed, gnorm as gn  # noqa: E402

import __graft_entry__ as graft  # noqa: E402
from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.train.loss3d import detect3d_loss  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
HW = (384, 1280)


def main():
    model, spec = build_model(
        "/root/repo/yolov10_3d_tpu/cfg/models/v10-3D/yolov10s_3D.yaml"
    )
    x0 = jnp.zeros((1, *HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    params, bs = variables["params"], variables["batch_stats"]
    batch = graft.make_3d_batch(B, HW, M=20, nc=spec.nc)
    img = batch["img"].astype(jnp.bfloat16)
    batch = dict(batch, img=img)

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
    def g_model(params, img):
        return gn(jax.grad(lambda p: fwd.__wrapped__(p, img))(params))

    @jax.jit
    def g_full(params, batch):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": bs}, batch["img"], train=True,
                mutable=["batch_stats"],
            )
            total, aux = detect3d_loss(
                preds, batch, nc=spec.nc, strides=spec.strides, hyp=graft.HYP_3D
            )
            return total.astype(jnp.float32)

        return gn(jax.grad(f)(params))

    t_f = timed(fwd, params, img)
    print(f"B={B} 3D fwd train-mode     : {t_f*1e3:7.1f} ms", flush=True)
    t_gm = timed(g_model, params, img)
    print(
        f"B={B} 3D grad model         : {t_gm*1e3:7.1f} ms  "
        f"(bwd {(t_gm-t_f)*1e3:.1f}, bwd/fwd {(t_gm-t_f)/t_f:4.2f}x)",
        flush=True,
    )
    t_gf = timed(g_full, params, batch)
    print(
        f"B={B} 3D grad model+loss    : {t_gf*1e3:7.1f} ms  "
        f"(loss fwd+bwd adds {(t_gf-t_gm)*1e3:.1f})",
        flush=True,
    )
    px = B * HW[0] * HW[1] / 1e6
    print(f"per-Mpx grad model+loss: {t_gf*1e3/px:.2f} ms/Mpx "
          f"(2D B=128 was 266.6/52.4 = 5.09)", flush=True)


if __name__ == "__main__":
    main()
