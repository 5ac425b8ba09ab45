"""Modulated deformable convolution v2 (reference: torchvision
ops.deform_conv2d as used by nn/modules/conv.py:37 DeformableConv2d).

TPU-first: instead of the CUDA scatter/gather kernel, each kernel tap's
bilinear sample is a dense vectorized gather (XLA lowers clipped takes to
efficient dynamic-slices on TPU), and the modulated taps contract with the
weights in ONE einsum that maps onto the MXU:

    out[b,i,j,o] = bias[o] +
        sum_k m[b,i,j,k] * W[k,c,o] * bilinear(x, p0(i,j,k) + off[b,i,j,k], c)

Offsets use torchvision's layout: channel 2k is the y-offset and 2k+1 the
x-offset of tap k = ky*kw + kx; sampling outside the input reads zeros.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """x: (B, H, W, C); ys/xs: (B, N) absolute pixel coords. Returns
    (B, N, C) with zero padding outside the image."""
    B, H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = x.reshape(B, H * W, C)
        v = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return v * inb[..., None].astype(x.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(x.dtype)
    wx = wx[..., None].astype(x.dtype)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_conv2d(
    x: jax.Array,  # (B, H, W, C) NHWC
    offset: jax.Array,  # (B, H', W', 2*kh*kw) — (dy, dx) per tap
    mask: jax.Array,  # (B, H', W', kh*kw) modulation
    weight: jax.Array,  # (kh, kw, C, O) HWIO
    bias: Optional[jax.Array] = None,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """DCNv2 forward. Output (B, H', W', O) where H' = (H + 2p - d*(kh-1) - 1)
    // s + 1 (matches the offset/mask spatial size)."""
    B, H, W, C = x.shape
    kh, kw, _, O = weight.shape
    K = kh * kw
    _, Ho, Wo, _ = offset.shape
    sy, sx = stride
    py, px = padding
    dy, dx = dilation

    # base sampling positions p0: (Ho, Wo, K)
    iy = jnp.arange(Ho) * sy - py
    ix = jnp.arange(Wo) * sx - px
    ky = jnp.arange(kh) * dy
    kx = jnp.arange(kw) * dx
    base_y = iy[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,kh,1)
    base_x = ix[None, :, None, None] + kx[None, None, None, :]  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, kh, kw)).reshape(Ho, Wo, K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, kh, kw)).reshape(Ho, Wo, K)

    off = offset.reshape(B, Ho, Wo, K, 2)
    ys = base_y[None] + off[..., 0].astype(jnp.float32)
    xs = base_x[None] + off[..., 1].astype(jnp.float32)

    samples = _bilinear_gather(
        x, ys.reshape(B, Ho * Wo * K), xs.reshape(B, Ho * Wo * K)
    ).reshape(B, Ho, Wo, K, C)
    samples = samples * mask[..., None].astype(x.dtype)

    out = jnp.einsum("bhwkc,kco->bhwo", samples, weight.reshape(K, C, O))
    if bias is not None:
        out = out + bias
    return out
