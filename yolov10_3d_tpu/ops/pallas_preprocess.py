"""Fused on-device preprocessing (north-star requirement: the reference's
cv2-based letterbox/HSV/flip/mosaic host pipeline becomes device kernels
behind the sharded loader — BASELINE.json north_star; reference
data/augment.py:584 RandomHSV, :684 LetterBox, :135 Mosaic).

The HSV jitter is a Pallas TPU kernel (pure VPU element-wise over NHWC tiles);
letterbox/mosaic/flip/normalize are jit-fused XLA ops (resize + pad + gather
fuse well; a hand kernel buys nothing there). Everything is batched and
fixed-shape. Falls back to interpret mode off-TPU automatically via
pallas_call(interpret=...) when requested.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


# ----------------------------------------------------------------- HSV kernel
def _hsv_kernel(img_ref, gains_ref, out_ref):
    """One planar (1, 3, H, W) tile: RGB [0,1] -> HSV -> jitter -> RGB.

    Planar layout keeps W in the lane dimension (channels-last would put 3
    lanes per vector — pathological for Mosaic). gains = (gh, gs, gv)
    multiplicative factors (reference RandomHSV builds LUTs hue=(x*r)%180,
    sat/val=clip(x*r); continuous equivalent here).
    """
    r = img_ref[0, 0]
    g = img_ref[0, 1]
    b = img_ref[0, 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    # hue in [0, 6)
    hr = (g - b) / safe
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 6.0, h)

    b_idx = pl.program_id(0)
    gh = gains_ref[b_idx, 0]
    gs = gains_ref[b_idx, 1]
    gv = gains_ref[b_idx, 2]
    h = (h * gh) % 6.0
    s = jnp.clip(s * gs, 0.0, 1.0)
    v = jnp.clip(v * gv, 0.0, 1.0)

    i = jnp.floor(h)  # float sector 0..5 (int ops are unsupported in-mosaic)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    def pick(c0, c1, c2, c3, c4, c5):
        # chained where (jnp.select lowers to an argmax mosaic can't do)
        out = c5
        for cond, val in ((i == 4.0, c4), (i == 3.0, c3), (i == 2.0, c2),
                          (i == 1.0, c1), (i == 0.0, c0)):
            out = jnp.where(cond, val, out)
        return out

    out_ref[0, 0] = pick(v, q, p, p, t, v)
    out_ref[0, 1] = pick(t, v, v, q, p, p)
    out_ref[0, 2] = pick(p, p, t, v, v, q)


def hsv_jitter_jnp(img: jax.Array, gains: jax.Array) -> jax.Array:
    """Pure-jnp batched HSV jitter — the single shared implementation
    (device_aug composes it into the train step; the Pallas kernel below is
    its fused serving-path counterpart). imgs (B,H,W,3) fp32 [0,1];
    gains (B,3) multiplicative."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0, jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)
    ) / 6.0
    s = jnp.where(mx > 0, d / (mx + 1e-12), 0.0)
    v = mx
    gh, gs, gv = (gains[:, i][:, None, None] for i in range(3))
    h = (h * gh) % 1.0
    s = jnp.clip(s * gs, 0.0, 1.0)
    v = jnp.clip(v * gv, 0.0, 1.0)
    # hsv -> rgb
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], -1)


def hsv_jitter(imgs: jax.Array, gains: jax.Array, interpret: Optional[bool] = None) -> jax.Array:
    """Batched HSV jitter. imgs (B, H, W, 3) fp32 [0,1]; gains (B, 3)
    multiplicative (gh, gs, gv). Pallas kernel, one grid step per image."""
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable")
    B, H, W, C = imgs.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planar = imgs.transpose(0, 3, 1, 2)  # (B, 3, H, W): W in lanes
    # row-tile to stay under the ~16MB VMEM scoped limit (block + double buffer)
    th = H
    while th > 8 and 3 * th * W * 4 * 4 > 8 * 1024 * 1024:
        th //= 2
    if H % th:
        th = H  # fall back to whole image for odd shapes
    out = pl.pallas_call(
        _hsv_kernel,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec((1, 3, th, W), lambda b, r: (b, 0, r, 0)),
            # whole (B, 3) gains table in SMEM; kernel indexes by program_id
            pl.BlockSpec((B, 3), lambda b, r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, th, W), lambda b, r: (b, 0, r, 0)),
        out_shape=jax.ShapeDtypeStruct(planar.shape, imgs.dtype),
        interpret=interpret,
    )(planar, gains)
    return out.transpose(0, 2, 3, 1)


# ------------------------------------------------------- fused XLA composites
@functools.partial(jax.jit, static_argnames=("out_hw",))
def device_letterbox(imgs: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Uniform-size batched letterbox: bilinear resize to fit + center pad 114
    (serving path; per-image sizes are handled host-side)."""
    B, H, W, C = imgs.shape
    th, tw = out_hw
    r = min(th / H, tw / W)
    nh, nw = round(H * r), round(W * r)
    resized = jax.image.resize(imgs, (B, nh, nw, C), "bilinear")
    top = int(round((th - nh) / 2 - 0.1))
    left = int(round((tw - nw) / 2 - 0.1))
    out = jnp.full((B, th, tw, C), 114.0 / 255.0, imgs.dtype)
    return jax.lax.dynamic_update_slice(out, resized, (0, top, left, 0))


def device_flip_lr(imgs: jax.Array, flip_mask: jax.Array) -> jax.Array:
    """Per-image conditional horizontal flip. flip_mask (B,) bool."""
    flipped = imgs[:, :, ::-1]
    return jnp.where(flip_mask[:, None, None, None], flipped, imgs)


def device_mosaic4(
    imgs: jax.Array,      # (B, 4, H, W, 3) the 4 source tiles per output
    centers: jax.Array,   # (B, 2) mosaic center in [H/2, 3H/2) x [W/2, 3W/2)
) -> jax.Array:
    """Batched 4-image mosaic on device: builds the 2Hx2W canvas then crops
    is left to the caller (kept at 2Hx2W like the reference before
    RandomPerspective's border crop)."""
    B, _, H, W, C = imgs.shape
    canvas = jnp.full((B, 2 * H, 2 * W, C), 114.0 / 255.0, imgs.dtype)
    # place the 4 tiles at the quadrants around (yc, xc): approximate the
    # reference layout with tiles anchored to the center point
    yc = centers[:, 0].astype(jnp.int32)
    xc = centers[:, 1].astype(jnp.int32)

    def place(canvas, b):
        c = canvas[b]
        y, x = yc[b], xc[b]
        c = jax.lax.dynamic_update_slice(c, imgs[b, 0], (jnp.maximum(y - H, 0), jnp.maximum(x - W, 0), 0))
        c = jax.lax.dynamic_update_slice(c, imgs[b, 1], (jnp.maximum(y - H, 0), x, 0))
        c = jax.lax.dynamic_update_slice(c, imgs[b, 2], (y, jnp.maximum(x - W, 0), 0))
        c = jax.lax.dynamic_update_slice(c, imgs[b, 3], (y, x, 0))
        return canvas.at[b].set(c)

    for b in range(B):  # static unroll; B is small and shapes fixed
        canvas = place(canvas, b)
    return canvas


@functools.partial(jax.jit, static_argnames=("out_hw",))
def serve_preprocess(imgs_u8: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Full fused serving preprocess: uint8 NHWC -> letterboxed fp32 [0,1]."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    return device_letterbox(x, out_hw)
