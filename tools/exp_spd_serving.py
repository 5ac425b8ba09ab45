"""Measure the SPD-packed serving input contract (VERDICT r3 item #8).

Three serving shapes for YOLOv10-S 640^2 B=128 bf16 (fast_eval + decode):
  base        one jit: uint8 -> /255 -> model -> decode
  fused-pack  one jit: uint8 -> /255 -> space_to_depth -> packed model
              (round-1 measured this LOSES ~5%: the pack is an extra
              materialized layout pass in the same program)
  staged-pack jit A: uint8 -> /255 -> space_to_depth (the preprocess stage,
              whose output write is unavoidable anyway) ->
              jit B: packed (B,320,320,12) -> packed model -> decode
              (the +2%-if-input-arrives-packed hypothesis, PARITY round 3)

Methodology: per-call scalar readback fencing, min-of-16, RTT-cancelled
(tools/_bench_util.py conventions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.ops.postprocess import v10_detections
from yolov10_3d_tpu.ops.spd_stem import space_to_depth

B, HW = 128, 640


def timed(fn, *args, iters=16):
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    m_base, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml", fast_eval=True
    )
    m_packed, _ = build_model(
        "yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml", fast_eval=True,
        spd_stem="packed",
    )
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    v = jax.jit(m_base.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    v = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t, v
    )

    def decode(feats):
        det = v10_detections(feats, spec.strides, spec.nc, max_det=300)
        return det["scores"].sum()

    @jax.jit
    def base(v, x):
        xf = (x.astype(jnp.bfloat16) / 255.0)
        return decode(m_base.apply(v, xf, train=False)["one2one"])

    @jax.jit
    def fused_pack(v, x):
        xf = (x.astype(jnp.bfloat16) / 255.0)
        return decode(m_packed.apply(v, space_to_depth(xf), train=False)["one2one"])

    @jax.jit
    def stage_a(x):
        return space_to_depth(x.astype(jnp.bfloat16) / 255.0)

    @jax.jit
    def stage_b(v, p):
        return decode(m_packed.apply(v, p, train=False)["one2one"])

    trivial = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (B, HW, HW, 3), dtype=np.uint8))
    t_rtt = timed(trivial, x)

    t_base = timed(base, v, x) - t_rtt
    t_fused = timed(fused_pack, v, x) - t_rtt

    # staged: stage A's output stays on device; fence only at the end
    p = stage_a(x)
    p0 = trivial(p)  # warm
    t_stage_b = timed(stage_b, v, p) - t_rtt

    def staged(v, x):
        return stage_b(v, stage_a(x))

    t_staged = timed(staged, v, x) - t_rtt
    t_stage_a = timed(lambda x: stage_a(x).reshape(-1)[0].astype(jnp.float32), x) - t_rtt

    print(f"base       : {t_base*1e3:8.2f} ms  ({B/t_base:7.1f} img/s)")
    print(f"fused-pack : {t_fused*1e3:8.2f} ms  ({B/t_fused:7.1f} img/s)")
    print(f"staged A+B : {t_staged*1e3:8.2f} ms  ({B/t_staged:7.1f} img/s)")
    print(f"  stage A  : {t_stage_a*1e3:8.2f} ms (pack+normalize)")
    print(f"  stage B  : {t_stage_b*1e3:8.2f} ms (packed model, input resident)")
    print(f"packed-model-only speedup vs base: {t_base/t_stage_b:.3f}x")
    print(f"staged end-to-end vs base        : {t_base/t_staged:.3f}x")


if __name__ == "__main__":
    main()
