"""On-device training augmentation with label transforms
(BASELINE.json north star: "cv2-based letterbox/mosaic/HSV/random-perspective
augmentation pipeline becomes fused preprocessing behind a sharded loader").

TPU-first redesign of the reference pipeline (augment.py:135 Mosaic,
:347 RandomPerspective, :584 RandomHSV, :627 RandomFlip):

- the host loader only DECODES images into fixed-size uint8 tiles + label
  arrays (data/dataset.py ``DataLoader(device_aug=True)``);
- everything else — 4-tile mosaic, scale+translate crop, HSV jitter,
  horizontal flip, and all label coordinate transforms — runs inside ONE
  jitted program fused with the train step (train/state.py preprocess_fn),
  so the images cross PCIe once as uint8 and never return to the host.

Deviations from the cv2 reference, chosen for XLA-compatibility (all static
shapes, no per-sample resampling kernels):
- rotation/shear/perspective are not supported on the device path (their hyp
  defaults are 0.0 in default.yaml; non-zero values fall back to host aug);
- the random scale is realized as a per-sample crop-window SIZE drawn from a
  small fixed ladder (compile-once per ladder entry is avoided by using
  a single per-batch size) followed by one batched resize — the reference
  draws a continuous per-sample scale;
- the reference's random mosaic CENTER (augment.py:158, uniform in
  [s/2, 3s/2] with tiles cropped at the canvas edge) is realized as a FIXED
  2x2 tile grid + the random crop window: the tile-corner offset relative
  to the output window spans the same [-H/2, H/2] range, every label stays
  exactly aligned with its pixels, and no tile cropping/clamping is needed
  (XLA dynamic_update_slice clamps starts, which would silently shift
  tiles off their label offsets — measured in review).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _mosaic_canvas(tiles: jax.Array) -> jax.Array:
    """tiles (4, H, W, 3) fp32 -> the fixed 2Hx2W 2x2 grid (vmapped over the
    batch); the random crop window supplies the reference's center jitter."""
    _, H, W, C = tiles.shape
    top = jnp.concatenate([tiles[0], tiles[1]], axis=1)     # (H, 2W, C)
    bottom = jnp.concatenate([tiles[2], tiles[3]], axis=1)  # (H, 2W, C)
    return jnp.concatenate([top, bottom], axis=0)           # (2H, 2W, C)


def _tile_offsets(H: int, W: int) -> jax.Array:
    """(4, 2) per-tile (dy, dx) canvas offsets of the fixed 2x2 grid."""
    return jnp.asarray([[0, 0], [0, W], [H, 0], [H, W]], jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "crop_hw", "max_boxes"))
def device_train_augment(
    tiles_u8: jax.Array,     # (B, 4, H, W, 3) uint8, tiles pre-sized on host
    tile_labels: jax.Array,  # (B, 4, M, 5) cls + xyxy px in tile frame
    tile_mask: jax.Array,    # (B, 4, M) bool
    rng: jax.Array,          # PRNG key
    *,
    out_hw: Tuple[int, int],
    crop_hw: Tuple[int, int],
    max_boxes: int = 100,
    hsv_gains: Tuple[float, float, float] = (0.015, 0.7, 0.4),
    fliplr: float = 0.5,
) -> Dict[str, jax.Array]:
    """Fused mosaic4 -> translate crop (crop_hw window from the 2Hx2W canvas)
    -> resize to out_hw -> HSV -> flip, with exact label transforms.

    Returns {img (B,oh,ow,3) fp32 [0,1], gt_labels (B,K), gt_bboxes (B,K,4)
    normalized xywh, mask_gt (B,K)} — the train batch contract."""
    B, T, H, W, _ = tiles_u8.shape
    M = tile_labels.shape[2]
    oh, ow = out_hw
    ch, cw = crop_hw
    k_oy, k_ox, k_hsv, k_flip = jax.random.split(rng, 4)

    tiles = tiles_u8.astype(jnp.float32) / 255.0
    canvas = jax.vmap(_mosaic_canvas)(tiles)  # (B, 2H, 2W, 3) fixed 2x2 grid

    # random crop window == the reference's random mosaic center
    # (independent keys per axis: one shared key would pin oy == ox)
    # maxval is exclusive: +1 so the far-edge crop position is reachable
    oy = jax.random.randint(k_oy, (B,), 0, max(2 * H - ch, 0) + 1)
    ox = jax.random.randint(k_ox, (B,), 0, max(2 * W - cw, 0) + 1)
    crop = jax.vmap(
        lambda c, y, x: jax.lax.dynamic_slice(c, (y, x, 0), (ch, cw, 3))
    )(canvas, oy, ox)
    img = jax.image.resize(crop, (B, oh, ow, 3), "bilinear") if (ch, cw) != (oh, ow) else crop

    # HSV + flip
    r3 = jax.random.uniform(k_hsv, (B, 3), minval=-1.0, maxval=1.0)
    gains = 1.0 + r3 * jnp.asarray(hsv_gains)
    from .pallas_preprocess import hsv_jitter_jnp

    img = hsv_jitter_jnp(img, gains)
    flip = jax.random.uniform(k_flip, (B,)) < fliplr
    img = jnp.where(flip[:, None, None, None], img[:, :, ::-1], img)

    # ---- labels: tile frame -> canvas -> crop -> out scale -> flip ----
    offs = _tile_offsets(H, W)[None]  # (1,4,2) dy,dx — exact grid placement
    lab = tile_labels.astype(jnp.float32)
    x1 = lab[..., 1] + offs[..., 1:2]
    y1 = lab[..., 2] + offs[..., 0:1]
    x2 = lab[..., 3] + offs[..., 1:2]
    y2 = lab[..., 4] + offs[..., 0:1]
    # crop translate + resize scale
    sx = ow / cw
    sy = oh / ch
    x1 = (x1 - ox[:, None, None]) * sx
    x2 = (x2 - ox[:, None, None]) * sx
    y1 = (y1 - oy[:, None, None]) * sy
    y2 = (y2 - oy[:, None, None]) * sy
    x1 = jnp.clip(x1, 0, ow)
    x2 = jnp.clip(x2, 0, ow)
    y1 = jnp.clip(y1, 0, oh)
    y2 = jnp.clip(y2, 0, oh)
    # flip x
    fx = flip[:, None, None]
    nx1 = jnp.where(fx, ow - x2, x1)
    nx2 = jnp.where(fx, ow - x1, x2)
    x1, x2 = nx1, nx2

    w = x2 - x1
    h = y2 - y1
    valid = tile_mask & (w > 2.0) & (h > 2.0)  # candidate filter (augment.py:558)

    cls = lab[..., 0].reshape(B, T * M)
    xywh = jnp.stack(
        [(x1 + x2) / 2 / ow, (y1 + y2) / 2 / oh, w / ow, h / oh], -1
    ).reshape(B, T * M, 4)
    valid = valid.reshape(B, T * M)

    # compact the valid boxes to the front, pad/truncate to max_boxes —
    # fixed-shape sort-by-validity instead of host-side ragged concat
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :max_boxes]
    onehot = jax.nn.one_hot(order, T * M, dtype=jnp.float32)  # (B,K,TM)
    hi = jax.lax.Precision.HIGHEST  # bf16 default would round the box coords
    gt_bboxes = jnp.einsum("bkt,btf->bkf", onehot, xywh, precision=hi)
    gt_labels = jnp.einsum("bkt,bt->bk", onehot, cls, precision=hi).astype(jnp.int32)
    mask_gt = jnp.einsum(
        "bkt,bt->bk", onehot, valid.astype(jnp.float32), precision=hi
    ) > 0.5
    return {
        "img": img,
        "gt_labels": gt_labels,
        "gt_bboxes": gt_bboxes * mask_gt[..., None],
        "mask_gt": mask_gt,
    }
