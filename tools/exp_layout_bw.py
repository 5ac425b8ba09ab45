#!/usr/bin/env python
"""Layout/bandwidth census: how TPU HBM layouts inflate low-channel NHWC arrays.

The Mosaic dump for the stem input showed (B,642,648,128) tiling for a
logical (B,642,642,3) bf16 array — minor dim padded 3->128 (42x). If XLA's
HBM buffers carry that padding, the naive stem's cost is mostly layout
traffic, and the fix is a dense-minor input convention (merged W*C), not a
cleverer conv kernel.

Measurement notes (two prior garbage runs taught this):
  * block_until_ready does NOT fence through the axon tunnel — only a scalar
    readback does (tools/_bench_util.py).
  * returning `op(x).ravel()[0]` from jit lets XLA DCE the materialization
    (a copy probe measured 19 TB/s). Every probe here returns (scalar, y):
    y is a jit OUTPUT, so its full HBM write is forced and nothing folds.

Run: python tools/exp_layout_bw.py [B]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def fill(shape, dtype=jnp.bfloat16):
    return jax.block_until_ready(jax.jit(lambda: jnp.full(shape, 0.5, dtype))())


def forced(op):
    """jit(op) with the output materialized and a scalar first leaf."""

    @jax.jit
    def f(*args):
        y = op(*args)
        return y.ravel()[0].astype(jnp.float32), y

    return f


def main():
    print(f"rtt {rtt()*1e3:.2f} ms", flush=True)

    scale = jnp.bfloat16(1.0001)
    shapes = [
        ("input  (B,640,640,3)", (B, 640, 640, 3)),
        ("merged (B,640,1920)", (B, 640, 1920)),
        ("spd    (B,320,320,12)", (B, 320, 320, 12)),
        ("spd_m  (B,320,3840)", (B, 320, 3840)),
        ("stem_o (B,320,320,32)", (B, 320, 320, 32)),
        ("stem_m (B,320,10240)", (B, 320, 10240)),
        ("l2_o   (B,160,160,64)", (B, 160, 160, 64)),
        ("deep   (B,80,80,128)", (B, 80, 80, 128)),
    ]
    for name, shape in shapes:
        nbytes = int(np.prod(shape)) * 2
        x = fill(shape)
        t = timed(forced(lambda a: a * scale), x, iters=8)
        print(
            f"{name}: {nbytes/1e6:7.1f} MB  rw {t*1e3:7.2f} ms "
            f"({2*nbytes/t/1e9:6.1f} GB/s effective)",
            flush=True,
        )

    # --- XLA stem variants (identical math: conv k3 s2 p1 3->32, bias, SiLU) ---
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 32)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
    out_bytes = B * 320 * 320 * 32 * 2
    in_bytes = B * 640 * 640 * 3 * 2

    def report(tag, fn, *args):
        t = timed(fn, *args, iters=8)
        bw = (in_bytes + out_bytes) / t / 1e9
        print(f"{tag}: {t*1e3:7.2f} ms  ({bw:6.1f} GB/s apparent)", flush=True)
        return t

    def silu32(y):
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    def conv_nhwc(x, wk, strides=(2, 2), pad=((1, 1), (1, 1))):
        return jax.lax.conv_general_dilated(
            x, wk, strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    x_nhwc = fill((B, 640, 640, 3))
    report(
        "stem NHWC param          ",
        forced(lambda a: silu32(conv_nhwc(a, w) + bias)),
        x_nhwc,
    )

    x_m = fill((B, 640, 1920))
    report(
        "stem merged param + rs   ",
        forced(lambda a: silu32(conv_nhwc(a.reshape(B, 640, 640, 3), w) + bias)),
        x_m,
    )

    # SPD-packed input: exact rewrite (k2 s1 conv over 12ch)
    from yolov10_3d_tpu.ops.spd_stem import repack_stem_kernel  # noqa: E402

    x_spd = fill((B, 320, 320, 12))
    report(
        "stem SPD-packed param    ",
        forced(
            lambda p: silu32(
                jax.lax.conv_general_dilated(
                    p, repack_stem_kernel(w).astype(p.dtype), (1, 1),
                    ((1, 0), (1, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                + bias
            )
        ),
        x_spd,
    )

    # NCHW param (W in lanes, dense 640)
    x_nchw = fill((B, 3, 640, 640))
    report(
        "stem NCHW param          ",
        forced(
            lambda a: (
                lambda y: (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
            )(
                jax.lax.conv_general_dilated(
                    a, w, (2, 2), ((1, 1), (1, 1)),
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                    preferred_element_type=jnp.float32,
                )
                + bias[None, :, None, None]
            )
        ),
        x_nchw,
    )

    # merged param, stem, output kept merged (B,320,10240)
    report(
        "stem merged in+out       ",
        forced(
            lambda a: silu32(
                conv_nhwc(a.reshape(B, 640, 640, 3), w) + bias
            ).reshape(B, 320, 10240)
        ),
        x_m,
    )

    # stem + next layer (Conv 32->64 k3 s2): does the intermediate's layout tax
    # show up once the stem output is consumed on-chip instead of written out?
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    report(
        "stem+l1 NHWC param       ",
        forced(
            lambda a: silu32(
                conv_nhwc(silu32(conv_nhwc(a, w) + bias), w2) + b2
            )
        ),
        x_nhwc,
    )


if __name__ == "__main__":
    main()
