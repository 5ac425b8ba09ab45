"""Pallas TPU candidate kernels for the round-5 serving-perf campaign.

Three candidates, each a hand kernel for a path the round-1 analysis named
(PARITY.md §6) and the round-4 verdict asked to either wire or close with
per-kernel measurements (tools/exp_pallas_campaign.py runs the on-chip
shootout; results in PARITY.md round-5):

K1 ``decode_detect_pallas``  — fused NMS-free decode epilogue: DFL softmax x
    projection + dist2bbox + class sigmoid in ONE kernel over (batch, anchor)
    tiles (reference head.py:53-79 ``Detect.inference``; the XLA twin is
    ops/postprocess.decode_detect).
K2 ``int8_mm_fused``         — int8 1x1-conv/matmul with the FULL serving
    epilogue fused in VMEM: int32 accum -> dequantxBN scale + bias -> SiLU ->
    requant -> int8 out. int8 IO halves HBM traffic vs bf16; the round-2 XLA
    int8 mode lost on 1x1 shapes because the quant chains materialized
    between convs (PARITY round-2).
K3 ``int8_conv3x3_fused``    — direct 3x3/s1 int8 conv (9 shifted MXU
    matmuls over a VMEM-padded image tile) with the same fused epilogue;
    the "stem/k3" lever where XLA int8 isolation measured 1.28-1.81x bf16.

All kernels are exact (modulo the int8 quantization the caller chose) and
validated against their XLA twins in tests/test_pallas_kernels.py (interpret
mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REG_MAX = 16


# --------------------------------------------------------------- K1: decode
def _decode_kernel(x_ref, anc_ref, str_ref, boxes_ref, scores_ref, *, reg_max, nc):
    # No reshapes: Mosaic rejects lane-splitting shape casts like
    # (TA, 4*reg_max) -> (TA*4, reg_max) ("infer-vector-layout: unsupported
    # shape cast" on the real chip; interpret mode accepts it). The DFL
    # softmax-projection runs per side on four static reg_max-wide lane
    # slices instead — same math, layout-legal.
    x = x_ref[0].astype(jnp.float32)  # (TA, 4*reg_max + nc)
    # Mosaic's tpu.iota is integer-only; cast after (f32 iota fails to verify)
    proj = jax.lax.broadcasted_iota(jnp.int32, (1, reg_max), 1).astype(jnp.float32)
    dist = []
    for g in range(4):  # l, t, r, b
        bl = x[:, g * reg_max : (g + 1) * reg_max]  # (TA, reg_max)
        m = jnp.max(bl, axis=-1, keepdims=True)
        e = jnp.exp(bl - m)
        dist.append(
            jnp.sum(e * proj, axis=-1, keepdims=True)
            / jnp.sum(e, axis=-1, keepdims=True)
        )  # (TA, 1)
    anc = anc_ref[:]  # (TA, 2)
    stride = str_ref[:]  # (TA, 1)
    x1y1 = (anc - jnp.concatenate(dist[:2], axis=-1)) * stride
    x2y2 = (anc + jnp.concatenate(dist[2:], axis=-1)) * stride
    boxes_ref[0] = jnp.concatenate([x1y1, x2y2], axis=-1)
    scores_ref[0] = jax.nn.sigmoid(x[:, 4 * reg_max :])


def decode_detect_pallas(
    x: jax.Array, anchor_points: jax.Array, stride_tensor: jax.Array,
    nc: int, reg_max: int = REG_MAX, block_a: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused decode: (B, A, 4*reg_max+nc) raw maps + (A,2) anchors + (A,1)
    strides -> ((B, A, 4) xyxy boxes, (B, A, nc) sigmoid scores). A must be
    divisible by block_a (8400 = 8.4k at 640^2; pass block_a that divides)."""
    B, A, C = x.shape
    assert C == 4 * reg_max + nc, (C, reg_max, nc)
    while A % block_a:
        block_a //= 2
    grid = (B, A // block_a)
    kern = functools.partial(_decode_kernel, reg_max=reg_max, nc=nc)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_a, C), lambda b, a: (b, a, 0)),
            pl.BlockSpec((block_a, 2), lambda b, a: (a, 0)),
            pl.BlockSpec((block_a, 1), lambda b, a: (a, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_a, 4), lambda b, a: (b, a, 0)),
            pl.BlockSpec((1, block_a, nc), lambda b, a: (b, a, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, A, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, A, nc), jnp.float32),
        ],
        interpret=interpret,
    )(x, anchor_points, stride_tensor)


# ----------------------------------------------------- K2: int8 1x1 epilogue
def _int8_mm_kernel(x_ref, w_ref, s_ref, b_ref, inv_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    f = acc.astype(jnp.float32) * s_ref[:] + b_ref[:]
    f = f * jax.nn.sigmoid(f)  # SiLU
    q = jnp.round(f * inv_ref[0, 0])
    o_ref[:] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def int8_mm_fused(
    xq: jax.Array, wq: jax.Array, scale: jax.Array, bias: jax.Array,
    out_inv_scale: jax.Array, block_m: int = 4096, block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """int8 (M,K) @ (K,N) -> int32 accum -> f = silu(acc*scale + bias) ->
    int8 out = clip(round(f * out_inv_scale)). ``scale`` folds the x/w
    dequant scales AND the BN scale per output channel; ``bias`` is the BN
    bias. One kernel, one HBM round trip, int8 IO both sides."""
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2
    while M % block_m:
        block_m //= 2
    while N % block_n:
        block_n //= 2
    grid = (M // block_m, N // block_n)
    return pl.pallas_call(
        _int8_mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        interpret=interpret,
    )(xq, wq, scale.reshape(1, -1), bias.reshape(1, -1),
      out_inv_scale.reshape(1, 1))


# ----------------------------------------------------- K3: int8 3x3 epilogue
def _int8_c3_kernel(x_ref, w_ref, s_ref, b_ref, inv_ref, o_ref, *, H, W):
    # x_ref: (1, H+2, W+2, K) zero-padded int8 image; w_ref: (9, K, BN)
    xp = x_ref[0]
    K = xp.shape[-1]
    bn = w_ref.shape[-1]
    acc = jnp.zeros((H * W, bn), jnp.float32)
    i32 = jnp.zeros((H * W, bn), jnp.int32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        tap = xp[dy : dy + H, dx : dx + W, :].reshape(H * W, K)
        i32 = i32 + jnp.dot(tap, w_ref[t], preferred_element_type=jnp.int32)
    f = i32.astype(jnp.float32) * s_ref[:] + b_ref[:]
    f = f * jax.nn.sigmoid(f)
    q = jnp.round(f * inv_ref[0, 0])
    o_ref[0] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8).reshape(H, W, bn)


def int8_conv3x3_fused(
    xq: jax.Array, wq: jax.Array, scale: jax.Array, bias: jax.Array,
    out_inv_scale: jax.Array, block_n: int = 128, interpret: bool = False,
) -> jax.Array:
    """Direct 3x3/s1 SAME int8 conv with the fused serving epilogue.

    xq: (B, H, W, K) int8; wq: (3, 3, K, N) int8. Grid over (batch,
    out-channel tiles); each program holds one zero-padded image tile in
    VMEM and runs 9 shifted MXU matmuls + the dequant/BN/SiLU/requant
    epilogue — the int8 intermediate never round-trips HBM in f32."""
    B, H, W, K = xq.shape
    _, _, K2, N = wq.shape
    assert K == K2
    while N % block_n:
        block_n //= 2
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = wq.reshape(9, K, N)
    grid = (B, N // block_n)
    kern = functools.partial(_int8_c3_kernel, H=H, W=W)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, K), lambda b, j: (b, 0, 0, 0)),
            pl.BlockSpec((9, K, block_n), lambda b, j: (0, 0, j)),
            pl.BlockSpec((1, block_n), lambda b, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda b, j: (0, j)),
            pl.BlockSpec((1, 1), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, block_n), lambda b, j: (b, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, N), jnp.int8),
        interpret=interpret,
    )(xp, w9, scale.reshape(1, -1), bias.reshape(1, -1),
      out_inv_scale.reshape(1, 1))
