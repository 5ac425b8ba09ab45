#!/usr/bin/env python
"""Exact train-mode forward FLOPs (XLA cost analysis) for the 2D and 3D
flagship configs, to derive an honest FLOP-scaled 3D train baseline.

The bench's original 3D baseline scaled the 2D 350 img/s by the PIXEL ratio,
but the v10Detect3d head (16 branches x [Conv3x3 -> Conv3x3 -> 1x1] x 3
scales, reference head.py:627-652) carries several times the backbone's
FLOPs, so a reference GPU would be proportionally slower too. CPU-compiled:
cost analysis only, nothing executed.
"""

import sys

sys.path.insert(0, "/root/repo")
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.utils.profiling import flops  # noqa: E402


def census(tag, yaml_path, hw):
    model, spec = build_model(yaml_path)
    x0 = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    xb = jnp.zeros((1, *hw, 3), jnp.bfloat16)

    def fwd_train(v, x):
        preds, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return preds

    def fwd_eval(v, x):
        return model.apply(v, x, train=False)

    f_t = flops(fwd_train, variables, xb)
    f_e = flops(fwd_eval, variables, xb)
    print(
        f"{tag:12s} {hw[0]}x{hw[1]}: fwd(train) {f_t/1e9:7.2f} GFLOP/img   "
        f"fwd(eval) {f_e/1e9:7.2f} GFLOP/img",
        flush=True,
    )
    return f_t


def main():
    f2d = census(
        "yolov10s", "/root/repo/yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml",
        (640, 640),
    )
    f3d = census(
        "yolov10s-3D",
        "/root/repo/yolov10_3d_tpu/cfg/models/v10-3D/yolov10s_3D.yaml",
        (384, 1280),
    )
    print(
        f"FLOP ratio 3D/2D = {f3d/f2d:.3f}  ->  FLOP-scaled 3D train baseline"
        f" = 350 / ratio = {350.0 / (f3d/f2d):.1f} img/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
