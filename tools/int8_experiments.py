#!/usr/bin/env python
"""Isolated TPU experiments for the int8 serving design (round-2 lever,
PARITY.md round-1 notes): where does int8 actually win on this chip?

Compares, on representative YOLOv10-S layer shapes:
  a) XLA bf16 conv + BN + SiLU            (today's serving path)
  b) XLA int8-IO conv + fused epilogue    (int8 in -> int32 acc -> scale/bias
     -> SiLU -> requant int8 out; one elementwise fusion, 1-byte tensors
     between convs)
  c) Pallas fused int8 1x1 conv (matmul + epilogue in VMEM)

Run on the real chip: python tools/int8_experiments.py

TIMING CAVEAT (results recorded in PARITY.md "Round-2 continuation"):
block_until_ready does not fence through the axon tunnel and XLA CSEs
repeated identical calls — trustworthy numbers need chained calls with
REAL data dependence (distinct per-layer weights) + scalar readback, as in
bench.py. The definitive measurements used 16-layer chains: int8 wins only
on k>=3 dense convs (1.28-1.81x); 1x1 convs lose (0.6-0.75x); the Pallas
epilogue-fused matmul matches XLA int8 (no headroom). This script's simple
timers are kept for shape exploration only.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def conv_bf16(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


def conv_int8_flow(xq, wq, scale, bias, out_inv_scale):
    """int8 in -> int8 out; epilogue left to XLA fusion."""
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale + bias
    y = y * jax.nn.sigmoid(y)
    return jnp.clip(jnp.round(y * out_inv_scale), -127, 127).astype(jnp.int8)


def pallas_int8_mm(xq, wq, scale, bias, out_inv_scale, block_m=512):
    """1x1 conv as an int8 matmul with the epilogue fused in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, Cin = xq.shape
    Cout = wq.shape[-1]
    M = B * H * W
    x2 = xq.reshape(M, Cin)
    w2 = wq.reshape(Cin, Cout)

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * s_ref[:] + b_ref[:]
        y = y * jax.nn.sigmoid(y)
        o_ref[:] = jnp.clip(jnp.round(y * out_inv_scale), -127, 127).astype(jnp.int8)

    out = pl.pallas_call(
        kernel,
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, Cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, Cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.int8),
    )(x2, w2, scale.reshape(1, Cout), bias.reshape(1, Cout))
    return out.reshape(B, H, W, Cout)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    shapes = [
        # (B, H, W, Cin, Cout, k) — YOLOv10-S hot layers at batch 128
        (128, 80, 80, 128, 128, 1),
        (128, 40, 40, 256, 256, 1),
        (128, 20, 20, 512, 512, 1),
        (128, 80, 80, 64, 64, 3),
        (128, 40, 40, 128, 128, 3),
    ]
    for B, H, W, Cin, Cout, k in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, Cin, Cout)) * 0.05, jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 2, (Cout,)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 64), -127, 127).astype(jnp.int8)

        t_bf16 = timeit(jax.jit(conv_bf16), x, w, scale, bias)
        t_i8 = timeit(jax.jit(conv_int8_flow), xq, wq, scale, bias, 127.0 / 8.0)
        flops = 2 * B * H * W * Cin * Cout * k * k
        line = (
            f"({B},{H},{W},{Cin})->{Cout} k{k}: bf16 {t_bf16:.2f}ms "
            f"({flops/t_bf16/1e9:.0f} TF/s) | int8-xla {t_i8:.2f}ms "
            f"({flops/t_i8/1e9:.0f} TOP/s) | ratio {t_bf16/t_i8:.2f}x"
        )
        if k == 1:
            t_pl = timeit(
                functools.partial(jax.jit(pallas_int8_mm, static_argnames="block_m")),
                xq, wq, scale, bias, 127.0 / 8.0,
            )
            line += f" | pallas {t_pl:.2f}ms ({flops/t_pl/1e9:.0f} TOP/s, {t_bf16/t_pl:.2f}x)"
        print(line)


if __name__ == "__main__":
    main()
