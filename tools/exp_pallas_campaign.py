#!/usr/bin/env python
"""Round-5 Pallas kernel campaign: the on-chip shootout the round-4 verdict
asked for — either the flagship 2D numbers move >=15% or PARITY gains a
measured per-kernel closure table (achieved GB/s + TFLOP/s per candidate).

Candidates (yolov10_3d_tpu/ops/pallas_kernels.py):
  K1 fused decode epilogue (DFL softmax-proj + dist2bbox + sigmoid) vs the
     XLA decode slice, at the serving shape (B=128, A=8400, C=144).
  K2 int8 1x1 matmul with fused dequant/BN/SiLU/requant epilogue (int8 IO
     end to end) vs (a) XLA bf16 and (b) the XLA int8 flow set_int8_mode
     lowers (quant chains between convs), on the net's real 1x1 shapes.
  K3 int8 3x3/s1 conv with the same fused epilogue vs the same two XLA
     paths, on the net's real k3 interior shapes.

Methodology (PARITY round-3 lessons, tools/_bench_util.py): chained layers
with DISTINCT weights (real data dependence — no CSE), one scalar readback
fence per chain call, tunnel-RTT cancellation. Each row reports ms/layer,
effective TFLOP/s (2*M*K*N or conv FLOPs), and achieved GB/s (bytes actually
crossing HBM for that path's tensor dtypes).

Run on the real chip:  python tools/exp_pallas_campaign.py [--quick]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from _bench_util import timed  # noqa: E402

from yolov10_3d_tpu.ops.pallas_kernels import (  # noqa: E402
    decode_detect_pallas, int8_conv3x3_fused, int8_mm_fused,
)

L = 8  # chain depth


def _silu(x):
    return x * jax.nn.sigmoid(x)


# ------------------------------------------------------------------ K2 paths
def chain_bf16_mm(x, ws, scales, biases):
    for i in range(L):
        y = jnp.dot(x, ws[i], preferred_element_type=jnp.float32)
        x = _silu(y * scales[i] + biases[i]).astype(jnp.bfloat16)
    return x[0, 0].astype(jnp.float32), x


def chain_xla_int8_mm(xq, wqs, scales, biases, inv):
    """The set_int8_mode-style flow: int8 matmul -> f32 epilogue -> requant
    as SEPARATE XLA ops (XLA fuses what it can)."""
    for i in range(L):
        acc = jax.lax.dot_general(
            xq, wqs[i], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        f = _silu(acc.astype(jnp.float32) * scales[i] + biases[i])
        xq = jnp.clip(jnp.round(f * inv), -127, 127).astype(jnp.int8)
    return xq[0, 0].astype(jnp.float32), xq


def chain_pallas_int8_mm(xq, wqs, scales, biases, inv):
    for i in range(L):
        xq = int8_mm_fused(xq, wqs[i], scales[i], biases[i], inv)
    return xq[0, 0].astype(jnp.float32), xq


# ------------------------------------------------------------------ K3 paths
def chain_bf16_c3(x, ws, scales, biases):
    for i in range(L):
        y = jax.lax.conv_general_dilated(
            x, ws[i], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        x = _silu(y * scales[i] + biases[i]).astype(jnp.bfloat16)
    return x[0, 0, 0, 0].astype(jnp.float32), x


def chain_xla_int8_c3(xq, wqs, scales, biases, inv):
    for i in range(L):
        acc = jax.lax.conv_general_dilated(
            xq, wqs[i], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        f = _silu(acc.astype(jnp.float32) * scales[i] + biases[i])
        xq = jnp.clip(jnp.round(f * inv), -127, 127).astype(jnp.int8)
    return xq[0, 0, 0, 0].astype(jnp.float32), xq


def chain_pallas_int8_c3(xq, wqs, scales, biases, inv):
    for i in range(L):
        xq = int8_conv3x3_fused(xq, wqs[i], scales[i], biases[i], inv)
    return xq[0, 0, 0, 0].astype(jnp.float32), xq


def row(name, ms, flops, bytes_):
    tf = f"{flops / ms / 1e9:7.1f} TF/s" if flops else "      —     "
    gb = bytes_ / ms / 1e6
    print(f"  {name:<28} {ms:8.3f} ms/layer   {tf}   {gb:7.0f} GB/s", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", choices=["k1", "k2", "k3"], default=None,
                    help="run one kernel section (compiles are slow through the tunnel)")
    ap.add_argument("--shapes", default=None,
                    help="comma list of hw:C pairs, e.g. 80:128,40:256")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    B = 32 if args.quick else 128
    shapes_arg = (
        [tuple(int(v) for v in s.split(":")) for s in args.shapes.split(",")]
        if args.shapes else [(80, 128), (40, 256), (20, 512)]
    )

    if args.only in (None, "k2"):
        _k2(rng, B, shapes_arg)
    if args.only in (None, "k3"):
        _k3(rng, B, shapes_arg)
    if args.only in (None, "k1"):
        _k1(rng, B)


def _k2(rng, B, shapes_arg):
    print(f"== K2: 1x1 (matmul) chains, depth {L}, B={B} imgs ==", flush=True)
    for hw, C in shapes_arg:
        M = B * hw * hw
        K = N = C
        flops = 2.0 * M * K * N
        xb = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32)).astype(jnp.bfloat16)
        ws_b = [
            jnp.asarray(rng.normal(0, C ** -0.5, (K, N)).astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(L)
        ]
        scales = [jnp.asarray(rng.uniform(1e-4, 2e-4, N).astype(np.float32)) for _ in range(L)]
        biases = [jnp.asarray(rng.uniform(-0.1, 0.1, N).astype(np.float32)) for _ in range(L)]
        xq = jnp.asarray(rng.integers(-127, 128, (M, K)).astype(np.int8))
        wqs = [jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8)) for _ in range(L)]
        inv = jnp.float32(4.0)

        print(f" shape M={M} K={K} N={N} ({hw}x{hw}x{C}):")
        f = jax.jit(chain_bf16_mm)
        ms = timed(f, xb, ws_b, scales, biases, iters=4) / L * 1e3
        row("XLA bf16 + BN/SiLU", ms, flops, 2 * (M * K + K * N + M * N))
        f = jax.jit(chain_xla_int8_mm)
        ms = timed(f, xq, wqs, scales, biases, inv, iters=4) / L * 1e3
        row("XLA int8 flow", ms, flops, M * K + K * N + M * N)
        f = jax.jit(chain_pallas_int8_mm)
        ms = timed(f, xq, wqs, scales, biases, inv, iters=4) / L * 1e3
        row("Pallas int8 fused", ms, flops, M * K + K * N + M * N)


def _k3(rng, B, shapes_arg):
    print(f"\n== K3: 3x3/s1 conv chains, depth {L}, B={B} imgs ==", flush=True)
    for hw, C in shapes_arg:
        flops = 2.0 * B * hw * hw * C * C * 9
        xb = jnp.asarray(rng.normal(0, 1, (B, hw, hw, C)).astype(np.float32)).astype(jnp.bfloat16)
        ws_b = [
            jnp.asarray(rng.normal(0, (9 * C) ** -0.5, (3, 3, C, C)).astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(L)
        ]
        scales = [jnp.asarray(rng.uniform(1e-4, 2e-4, C).astype(np.float32)) for _ in range(L)]
        biases = [jnp.asarray(rng.uniform(-0.1, 0.1, C).astype(np.float32)) for _ in range(L)]
        xq = jnp.asarray(rng.integers(-127, 128, (B, hw, hw, C)).astype(np.int8))
        wqs = [jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)).astype(np.int8)) for _ in range(L)]
        inv = jnp.float32(0.05)
        act = B * hw * hw * C

        print(f" shape B={B} {hw}x{hw}x{C}:")
        f = jax.jit(chain_bf16_c3)
        ms = timed(f, xb, ws_b, scales, biases, iters=4) / L * 1e3
        row("XLA bf16 + BN/SiLU", ms, flops, 2 * (2 * act + 9 * C * C))
        f = jax.jit(chain_xla_int8_c3)
        ms = timed(f, xq, wqs, scales, biases, inv, iters=4) / L * 1e3
        row("XLA int8 flow", ms, flops, 2 * act + 9 * C * C)
        f = jax.jit(chain_pallas_int8_c3)
        ms = timed(f, xq, wqs, scales, biases, inv, iters=4) / L * 1e3
        row("Pallas int8 fused", ms, flops, 2 * act + 9 * C * C)


def _k1(rng, B):
    print("\n== K1: decode epilogue, (B, 8400, 144) ==", flush=True)
    from yolov10_3d_tpu.ops.boxes import make_anchors
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    nc = 80
    shapes = [(80, 80), (40, 40), (20, 20)]
    strides = (8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(0, 1, (B, h, w, 144)).astype(np.float32)).astype(jnp.bfloat16)
        for h, w in shapes
    ]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    flat = jnp.concatenate([f.reshape(B, -1, 144) for f in feats], 1)
    A = flat.shape[1]

    def _fence(y):
        return jax.tree.leaves(y)[0].ravel()[0], y

    xla_dec = jax.jit(lambda fs: _fence(decode_detect(fs, strides, nc)))
    pl_dec = jax.jit(
        lambda x: _fence(decode_detect_pallas(x, anchors, stride_t, nc, block_a=1200))
    )
    dec_bytes = 2 * B * A * 144 + 4 * B * A * 84  # bf16 in, f32 out
    ms = timed(xla_dec, feats, iters=8) * 1e3
    row("XLA decode (from feats)", ms, None, dec_bytes)
    ms = timed(pl_dec, flat, iters=8) * 1e3
    row("Pallas fused decode", ms, None, dec_bytes)


if __name__ == "__main__":
    main()
