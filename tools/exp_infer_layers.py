#!/usr/bin/env python
"""Per-layer attribution of the serving forward (VERDICT r2 item #10).

Times jitted prefix graphs (model up to layer k, bf16, fast_eval) and
differences consecutive prefixes to attribute per-layer cost; prefix timing
includes XLA's real fusion context, unlike isolated-layer microbenches.
Also A/Bs spd_stem=True on the full bench-shaped forward.

Usage: python tools/exp_infer_layers.py [B] [--spd]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from _bench_util import rtt, timed  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.ops.postprocess import v10_detections  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128
HW = 640


def build(spd):
    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml",
        fast_eval=True, spd_stem=spd,
    )
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    variables = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables,
    )
    return model, spec, variables


def full_fwd(model, spec, variables, x):
    @jax.jit
    def f(v, x):
        feats = model.apply(v, x, train=False)["one2one"]
        det = v10_detections(feats, spec.strides, spec.nc, max_det=300)
        return det["scores"].sum()

    return timed(f, variables, x)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    print(f"B={B} rtt={rtt()*1e3:.2f} ms")

    model, spec, variables, = build(spd=False)
    t_base = full_fwd(model, spec, variables, x)
    print(f"baseline full fwd+decode: {t_base*1e3:.2f} ms  "
          f"{B/t_base:.1f} img/s")

    model_s, spec_s, variables_s = build(spd=True)
    t_spd = full_fwd(model_s, spec_s, variables_s, x)
    print(f"spd_stem full fwd+decode: {t_spd*1e3:.2f} ms  "
          f"{B/t_spd:.1f} img/s")

    if "--layers" not in sys.argv:
        return

    # prefix timing: jit the model truncated after layer k (reuse the same
    # variables — flax only touches the params the traced layers use)
    n_layers = len(spec.layers)
    prev = 0.0
    rows = []
    for k in range(n_layers):
        mod_k = type(model)(
            spec=type(spec)(
                nc=spec.nc,
                layers=spec.layers[: k + 1],
                save=tuple(s for s in spec.save if s <= k),
                head_index=spec.head_index if k == spec.head_index else -1,
                head_module=spec.head_module if k == spec.head_index else "",
                strides=spec.strides,
                yaml_extras=spec.yaml_extras,
            ),
            fast_eval=True,
        )

        @jax.jit
        def f(v, x, m=mod_k, k=k):
            out = m.apply(v, x, train=False)
            if isinstance(out, dict):
                out = out["one2one"]
            if isinstance(out, (list, tuple)):
                return sum(o.astype(jnp.float32).sum() for o in out)
            return out.astype(jnp.float32).sum()

        t = timed(f, variables, x, iters=8)
        layer = spec.layers[k]
        rows.append((k, layer.module, (t - prev) * 1e3, t * 1e3))
        print(f"layer {k:2d} {layer.module:>14s}  +{(t-prev)*1e3:7.2f} ms  "
              f"cum {t*1e3:8.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
