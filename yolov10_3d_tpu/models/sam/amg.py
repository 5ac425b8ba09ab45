"""Automatic-mask-generation utilities (reference: models/sam/amg.py).

Vectorized jnp/numpy re-designs: stability score and mask->box run as single
fused array ops on device; crop/point-grid bookkeeping stays host-side numpy
(static per image size).
"""

from __future__ import annotations

import math
from itertools import product
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) evenly spaced points in [0,1]^2 (reference amg.py:48)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    xs = np.tile(side[None, :], (n_per_side, 1))
    ys = np.tile(side[:, None], (1, n_per_side))
    return np.stack([xs, ys], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(
    n_per_side: int, n_layers: int, scale_per_layer: int
) -> List[np.ndarray]:
    """Point grids for each crop layer (reference amg.py:57)."""
    return [build_point_grid(int(n_per_side / scale_per_layer**i)) for i in range(n_layers + 1)]


def generate_crop_boxes(
    im_size: Tuple[int, int], n_layers: int, overlap_ratio: float
) -> Tuple[List[List[int]], List[int]]:
    """Layered crop boxes, (2^i)^2 per layer i (reference amg.py:62)."""
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        cw = crop_len(im_w, n_side, overlap)
        ch = crop_len(im_h, n_side, overlap)
        for x0, y0 in product(
            [int((cw - overlap) * i) for i in range(n_side)],
            [int((ch - overlap) * i) for i in range(n_side)],
        ):
            crop_boxes.append([x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def batch_iterator(batch_size: int, *args):
    """Yield equal slices of same-length inputs (reference amg.py:24)."""
    assert args and all(len(a) == len(args[0]) for a in args)
    n = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n):
        yield [a[b * batch_size : (b + 1) * batch_size] for a in args]


def calculate_stability_score(
    masks: jnp.ndarray, mask_threshold: float, threshold_offset: float
) -> jnp.ndarray:
    """IoU of the high- vs low-thresholded binarizations (reference amg.py:32)."""
    hi = (masks > (mask_threshold + threshold_offset)).sum((-1, -2))
    lo = (masks > (mask_threshold - threshold_offset)).sum((-1, -2))
    return hi / jnp.maximum(lo, 1)


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """xyxy boxes around binary masks; zeros for empty masks
    (reference amg.py:152)."""
    if masks.size == 0:
        return jnp.zeros((*masks.shape[:-2], 4), jnp.float32)
    shape = masks.shape
    h, w = shape[-2:]
    m = masks.reshape(-1, h, w).astype(bool)
    in_h = m.any(-1)  # (N, h)
    in_w = m.any(-2)  # (N, w)
    ys = jnp.arange(h)[None]
    xs = jnp.arange(w)[None]
    bottom = jnp.max(jnp.where(in_h, ys, 0), -1)
    top = jnp.min(jnp.where(in_h, ys, h), -1)
    right = jnp.max(jnp.where(in_w, xs, 0), -1)
    left = jnp.min(jnp.where(in_w, xs, w), -1)
    empty = ~m.any((-1, -2))
    out = jnp.stack([left, top, right, bottom], -1)
    out = jnp.where(empty[:, None], 0, out)
    return out.reshape(*shape[:-2], 4)


def is_box_near_crop_edge(
    boxes: jnp.ndarray, crop_box, orig_box, atol: float = 20.0
) -> jnp.ndarray:
    """True where a box touches the crop edge but not the image edge
    (reference amg.py:11)."""
    crop = jnp.asarray(crop_box, jnp.float32)
    orig = jnp.asarray(orig_box, jnp.float32)
    b = uncrop_boxes_xyxy(boxes, crop_box).astype(jnp.float32)
    near_crop = jnp.abs(b - crop[None]) <= atol
    near_img = jnp.abs(b - orig[None]) <= atol
    return jnp.any(near_crop & ~near_img, axis=1)


def uncrop_boxes_xyxy(boxes: jnp.ndarray, crop_box) -> jnp.ndarray:
    """Add the crop offset back (reference amg.py:101)."""
    x0, y0 = crop_box[0], crop_box[1]
    off = jnp.asarray([x0, y0, x0, y0], boxes.dtype)
    return boxes + (off[None, None] if boxes.ndim == 3 else off[None])


def uncrop_points(points: jnp.ndarray, crop_box) -> jnp.ndarray:
    """Add the crop offset back to points (reference amg.py:111)."""
    off = jnp.asarray(crop_box[:2], points.dtype)
    return points + (off[None, None] if points.ndim == 3 else off[None])


def uncrop_masks(masks: jnp.ndarray, crop_box, orig_h: int, orig_w: int) -> jnp.ndarray:
    """Zero-pad crop masks back to image size (reference amg.py:121)."""
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    return jnp.pad(
        masks, ((0, 0), (y0, orig_h - y1), (x0, orig_w - x1))
    )


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Drop small holes or islands via connected components
    (reference amg.py:132; scipy.ndimage instead of cv2)."""
    from scipy import ndimage

    assert mode in {"holes", "islands"}
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask.astype(bool)).astype(np.uint8)
    labels, n = ndimage.label(working, structure=np.ones((3, 3)))
    sizes = ndimage.sum_labels(working, labels, index=np.arange(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n + 1) if i not in fill] or [int(np.argmax(sizes)) + 1]
    return np.isin(labels, fill), True
