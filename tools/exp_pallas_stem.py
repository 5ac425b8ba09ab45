#!/usr/bin/env python
"""Pallas fused stem experiment (VERDICT r2 item #10).

Hypothesis: the serving stem (Conv 3->32 k3 s2 @640^2 + BN + SiLU) is
bandwidth-bound and XLA's lowering of the 3-channel conv wastes MXU lanes;
a hand-fused Pallas kernel (pad + 9 stride-2 taps via reshape phases +
accumulated tap matmuls + folded BN + SiLU in one VMEM pass) might beat it.

Measures the XLA stem vs the Pallas stem in isolation at the bench shape
(B=128, bf16). Keep-if-wins: only wire into the model if the isolated win
is big enough to matter e2e (stem is ~3% of the 46ms serving forward).
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

B, H, W, CIN, COUT = 128, 640, 640, 3, 32


def timed(fn, *args, iters=16):
    r = fn(*args)
    jax.block_until_ready(r)
    float(jnp.asarray(r).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


# ---- reference XLA stem: conv k3 s2 p1 + folded BN bias + SiLU -------------

@jax.jit
def xla_stem(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


# ---- pallas fused stem ------------------------------------------------------

def _stem_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)          # (H, W, 3)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))  # (H+2, W+2, 3)
    HO, WO = H // 2, W // 2
    r = xp.reshape(HO + 1, 2, W + 2, CIN)

    def rows(dy):
        if dy == 0:
            return r[:HO, 0]
        if dy == 1:
            return r[:HO, 1]
        return r[1:, 0]

    acc = jnp.zeros((HO * WO, COUT), jnp.float32)
    for dy in range(3):
        t = rows(dy)                            # (HO, W+2, 3)
        c = t.reshape(HO, WO + 1, 2, CIN)
        for dx in range(3):
            if dx == 0:
                tap = c[:, :WO, 0]
            elif dx == 1:
                tap = c[:, :WO, 1]
            else:
                tap = c[:, 1:, 0]
            acc = acc + jnp.dot(
                tap.reshape(HO * WO, CIN), w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    y = acc + b_ref[:]
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(HO, WO, COUT).astype(jnp.bfloat16)


@jax.jit
def pallas_stem(x, w, b):
    return pl.pallas_call(
        _stem_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, COUT), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, COUT), jnp.bfloat16),
    )(x, w, b)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, CIN)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, CIN, COUT)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)

    t_rtt = timed(jax.jit(lambda x: x[0, 0, 0, 0].astype(jnp.float32)), x)
    print(f"rtt {t_rtt*1e3:.2f} ms")

    ref = xla_stem(x, w.astype(jnp.bfloat16), b)
    t_xla = timed(xla_stem, x, w.astype(jnp.bfloat16), b) - t_rtt
    print(f"XLA stem:    {t_xla*1e3:7.2f} ms  "
          f"({(B*(H//2)*(W//2)*COUT*CIN*18)/t_xla/1e12:.1f} TFLOP/s, "
          f"{(x.nbytes + B*(H//2)*(W//2)*COUT*2)/t_xla/1e9:.0f} GB/s)")

    try:
        out = pallas_stem(x, w, b)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        t_pal = timed(pallas_stem, x, w, b) - t_rtt
        print(f"Pallas stem: {t_pal*1e3:7.2f} ms  maxerr {err:.4f}  "
              f"({(x.nbytes + B*(H//2)*(W//2)*COUT*2)/t_pal/1e9:.0f} GB/s)")
        print(f"speedup: {t_xla/t_pal:.2f}x")
    except Exception as e:
        print("pallas failed:", repr(e)[:2000])


if __name__ == "__main__":
    main()
