#!/usr/bin/env python
"""Depthwise conv formulations on the real chip (r3 perf campaign).

profile_bwd.py measured XLA's grouped-conv DW at ~0.3 TF/s (~8% of the
HBM-bandwidth roof) — DW layers are ~40% of the v10s train step. Candidates:
  A. nn.Conv(feature_group_count=C)           — XLA grouped conv (baseline)
  B. shift-FMA: sum_{i,j} slice(x)[...]*k[i,j] — 9 fused VPU FMAs over lanes
Shapes = the actual v10s DW sites at 640^2.
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from functools import partial

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_LAYERS = 24


def dw_shift_fma(x, k, stride=1):
    """Depthwise conv, SAME padding, as k*k shifted strided slices each fused
    with a broadcast multiply-accumulate. x (B,H,W,C), k (kh,kw,C)."""
    kh, kw, C = k.shape
    ph, pw = kh // 2, kw // 2
    Bb, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    oh, ow = (H + stride - 1) // stride, (W + stride - 1) // stride
    out = jnp.zeros((Bb, oh, ow, C), x.dtype)
    for i in range(kh):
        for j in range(kw):
            sl = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (Bb, i + (oh - 1) * stride + 1, j + (ow - 1) * stride + 1, C),
                (1, stride, stride, 1),
            )
            out = out + sl * k[i, j]
    return out


from _bench_util import gnorm, timed_min  # noqa: E402


def bench(name, H, W, C, kk=3, stride=1):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    ks = [jax.random.normal(jax.random.PRNGKey(i + 1), (kk, kk, C), jnp.bfloat16)
          for i in range(N_LAYERS)]

    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (kk, kk, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    pad = kk // 2

    def chain_xla(x, ks):
        for k in ks:
            x = jax.lax.conv_general_dilated(
                x, k.reshape(kk, kk, 1, C), (stride, stride),
                [(pad, pad), (pad, pad)], dimension_numbers=dn,
                feature_group_count=C,
            )
        return x.astype(jnp.float32).sum()

    def chain_fma(x, ks):
        for k in ks:
            x = dw_shift_fma(x, k, stride)
        return x.astype(jnp.float32).sum()

    # numerics check (f32 on one layer)
    xa = x[:1].astype(jnp.float32)
    ka = ks[0].astype(jnp.float32)
    ya = jax.lax.conv_general_dilated(
        xa, ka.reshape(kk, kk, 1, C), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xa.shape, (kk, kk, 1, C), ("NHWC", "HWIO", "NHWC")),
        feature_group_count=C)
    yb = dw_shift_fma(xa, ka, stride)
    err = float(jnp.abs(ya - yb).max())
    assert err < 1e-3, err

    r = {}
    for tag, fn in (("xla", chain_xla), ("fma", chain_fma)):
        fwd = jax.jit(fn)
        grd = jax.jit(lambda x, ks, f=fn: gnorm(jax.grad(
            lambda kk_: f(x, kk_))(ks)))
        tf = max(timed_min(fwd, x, ks), 1e-6) / N_LAYERS
        tg = max(timed_min(grd, x, ks), 1e-6) / N_LAYERS
        r[tag] = (tf, tg)
    (af, ag), (bf, bg) = r["xla"], r["fma"]
    print(f"{name:26s} xla fwd {af*1e3:6.2f} grad {ag*1e3:6.2f} | "
          f"fma fwd {bf*1e3:6.2f} grad {bg*1e3:6.2f} | "
          f"speedup fwd {af/bf:4.1f}x grad {ag/bg:4.1f}x", flush=True)


if __name__ == "__main__":
    print(f"B={B}")
    bench("DW k3 s1 @80x80x128", 80, 80, 128)
    bench("DW k3 s1 @40x40x256", 40, 40, 256)
    bench("DW k3 s1 @20x20x512", 20, 20, 512)
    bench("DW k3 s2 @80x80x256", 80, 80, 256, stride=2)
    bench("DW k7 s1 @20x20x512", 20, 20, 512, kk=7)
