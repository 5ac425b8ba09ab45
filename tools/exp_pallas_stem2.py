#!/usr/bin/env python
"""Pallas fused stem, take 2: band-tiled with manual HBM->VMEM DMA.

Take 1 overflowed VMEM (whole-image f32 accumulator). This version pads the
image once in XLA, then each grid step (b, band) DMAs a (2*TH+1)-row halo
band, builds the 9 stride-2 taps via pair reshapes (no strided slicing), and
accumulates tap matmuls in f32 before SiLU.

Variants:
  A: band kept NHWC (lane dim = C = 3 -> 3/128 lanes in VMEM)
  B: band DMA'd as (rows, W*C) merged minor dims (full lanes on the wire),
     un-merged in VMEM

Usage: python tools/exp_pallas_stem2.py [A|B|both]
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
TH = 80  # output rows per band
HP, WP = H + 2, W + 2
HO, WO = H // 2, W // 2
NB = HO // TH


def timed(fn, *args, iters=16):
    r = fn(*args)
    float(jnp.asarray(r).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


@jax.jit
def xla_stem(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b
    return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)


def _taps_from_band(band_f32):
    """band (2TH+1, WP, 3) f32 -> 9 taps of (TH, WO, 3)."""
    zrow = jnp.zeros((1, WP, CIN), jnp.float32)
    r01 = band_f32[: 2 * TH].reshape(TH, 2, WP, CIN)
    row = {
        0: r01[:, 0],
        1: r01[:, 1],
        2: jnp.concatenate([band_f32[2:], zrow], 0).reshape(TH, 2, WP, CIN)[:, 0],
    }
    taps = []
    for dy in range(3):
        t = row[dy]  # (TH, WP, 3)
        c01 = t[:, : 2 * WO].reshape(TH, WO, 2, CIN)
        taps.append(c01[:, :, 0])
        taps.append(c01[:, :, 1])
        # dx=2 taps are cols 2,4,...,2*WO; t[:, 2:] has exactly 2*WO cols
        taps.append(t[:, 2:].reshape(TH, WO, 2, CIN)[:, :, 0])
    return taps  # order: (dy0,dx0),(dy0,dx1),(dy0,dx2),(dy1,dx0)...


def _stem_kernel_a(x_hbm, w_ref, b_ref, o_ref, xband, sem):
    b = pl.program_id(0)
    r = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(2 * TH * r, 2 * TH + 1)], xband, sem
    )
    cp.start()
    cp.wait()
    band = xband[:].astype(jnp.float32)
    taps = _taps_from_band(band)
    acc = jnp.zeros((TH * WO, COUT), jnp.float32)
    k = 0
    for dy in range(3):
        for dx in range(3):
            acc = acc + jnp.dot(
                taps[k].reshape(TH * WO, CIN), w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
            k += 1
    y = acc + b_ref[:]
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(TH, WO, COUT).astype(jnp.bfloat16)


def _stem_kernel_b(x_hbm, w_ref, b_ref, o_ref, xband, sem):
    b = pl.program_id(0)
    r = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(2 * TH * r, 2 * TH + 1)], xband, sem
    )
    cp.start()
    cp.wait()
    band = xband[:].astype(jnp.float32).reshape(2 * TH + 1, WP, CIN)
    taps = _taps_from_band(band)
    acc = jnp.zeros((TH * WO, COUT), jnp.float32)
    k = 0
    for dy in range(3):
        for dx in range(3):
            acc = acc + jnp.dot(
                taps[k].reshape(TH * WO, CIN), w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
            k += 1
    y = acc + b_ref[:]
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(TH, WO, COUT).astype(jnp.bfloat16)


def make_pallas_stem(variant):
    kern = _stem_kernel_a if variant == "A" else _stem_kernel_b
    band_shape = (
        (2 * TH + 1, WP, CIN) if variant == "A" else (2 * TH + 1, WP * CIN)
    )

    @jax.jit
    def f(x, w, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        if variant == "B":
            xp = xp.reshape(B, HP, WP * CIN)
        return pl.pallas_call(
            kern,
            grid=(B, NB),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TH, WO, COUT), lambda b_, r_: (b_, r_, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((B, HO, WO, COUT), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM(band_shape, jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(xp, w, b)

    return f


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, CIN)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, CIN, COUT)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)

    t_rtt = timed(jax.jit(lambda x: x[0, 0, 0, 0].astype(jnp.float32)), x)
    print(f"rtt {t_rtt*1e3:.2f} ms")
    ref = xla_stem(x, w.astype(jnp.bfloat16), b)
    t_xla = timed(xla_stem, x, w.astype(jnp.bfloat16), b) - t_rtt
    bw = (x.nbytes + B * HO * WO * COUT * 2) / t_xla / 1e9
    print(f"XLA stem:      {t_xla*1e3:7.2f} ms  ({bw:.0f} GB/s apparent)")

    for variant in (["A", "B"] if which == "both" else [which]):
        try:
            f = make_pallas_stem(variant)
            out = f(x, w, b)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            t = timed(f, x, w, b) - t_rtt
            bw = (x.nbytes + B * HO * WO * COUT * 2) / t / 1e9
            print(f"Pallas stem {variant}: {t*1e3:7.2f} ms  maxerr {err:.4f}  "
                  f"({bw:.0f} GB/s)  speedup {t_xla/t:.2f}x")
        except Exception as e:
            print(f"pallas {variant} failed:", repr(e)[:600])


if __name__ == "__main__":
    main()
