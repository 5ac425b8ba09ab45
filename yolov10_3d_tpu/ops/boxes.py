"""Box geometry ops (reference: ultralytics/utils/{tal,ops,metrics}.py).

Pure jnp functions, fixed shapes, fp32 internals — safe under bf16 activations.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Grid-center anchor points (reference tal.py:300 ``make_anchors``).

    feat_shapes: [(h, w), ...] per scale. Returns (anchor_points (A,2) in grid
    units, stride_tensor (A,1)).
    """
    pts, strs = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        strs.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def dist2bbox(distance: jax.Array, anchor_points: jax.Array, xywh: bool = True) -> jax.Array:
    """ltrb distances -> boxes (reference tal.py:315)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points: jax.Array, bbox: jax.Array, reg_max: int) -> jax.Array:
    """xyxy boxes -> ltrb distances clamped to reg_max (reference tal.py:330)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
        0,
        reg_max - 0.01,
    )


def xywh2xyxy(x: jax.Array) -> jax.Array:
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jax.Array) -> jax.Array:
    p1, p2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(p1 + p2) / 2, p2 - p1], axis=-1)


def bbox_iou(
    box1: jax.Array,
    box2: jax.Array,
    xywh: bool = True,
    ciou: bool = False,
    diou: bool = False,
    giou: bool = False,
    eps: float = 1e-7,
) -> jax.Array:
    """Elementwise (broadcasting) IoU family, parity with metrics.py:78.

    Inputs (..., 4); returns (..., 1).
    """
    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
        w1, h1 = box1[..., 2:3], box1[..., 3:4]
        w2, h2 = box2[..., 2:3], box2[..., 3:4]
    else:
        b1, b2 = box1, box2
        w1 = b1[..., 2:3] - b1[..., 0:1]
        h1 = b1[..., 3:4] - b1[..., 1:2] + eps
        w2 = b2[..., 2:3] - b2[..., 0:1]
        h2 = b2[..., 3:4] - b2[..., 1:2] + eps

    b1_x1, b1_y1, b1_x2, b1_y2 = (b1[..., i : i + 1] for i in range(4))
    b2_x1, b2_y1, b2_x2, b2_y2 = (b2[..., i : i + 1] for i in range(4))

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (ciou or diou or giou):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if ciou or diou:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if ciou:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def box_iou_pairwise(boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """All-pairs plain IoU, xyxy: (N,4),(M,4) -> (N,M) (reference metrics.py:53)."""
    a1, a2 = jnp.split(boxes1[:, None, :], 2, axis=-1)  # (N,1,2) each
    b1, b2 = jnp.split(boxes2[None, :, :], 2, axis=-1)  # (1,M,2)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def _obb_covariance(obb: jax.Array):
    """(…, 5) = (x, y, w, h, r) -> covariance terms a, b, c (reference
    metrics.py:177 ``_get_covariance_matrix``)."""
    w, h, r = obb[..., 2], obb[..., 3], obb[..., 4]
    a = w**2 / 12
    b = h**2 / 12
    cos, sin = jnp.cos(r), jnp.sin(r)
    return (
        a * cos**2 + b * sin**2,
        a * sin**2 + b * cos**2,
        (a - b) * cos * sin,
    )


def probiou(obb1: jax.Array, obb2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Gaussian-distribution IoU for rotated boxes (reference metrics.py:198).
    Elementwise over broadcastable (…, 5) inputs; returns (…,)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _obb_covariance(obb1)
    a2, b2, c2 = _obb_covariance(obb2)
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / (
        (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    ) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / (
        (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    ) * 0.5
    t3 = jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0) * jnp.clip(a2 * b2 - c2**2, 0)) + eps)
        + eps
    ) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1 - hd


def clip_boxes(boxes: jax.Array, h: int, w: int) -> jax.Array:
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_boxes(
    boxes: jax.Array,
    from_shape: Tuple[int, int],
    to_shape: Tuple[int, int],
    padded: bool = True,
) -> jax.Array:
    """Undo letterbox: rescale boxes from model input to original image coords
    (reference ops.py:89 ``scale_boxes``). Shapes are (h, w)."""
    gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
    pad_w = round((from_shape[1] - to_shape[1] * gain) / 2 - 0.1) if padded else 0.0
    pad_h = round((from_shape[0] - to_shape[0] * gain) / 2 - 0.1) if padded else 0.0
    boxes = boxes - jnp.array([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, to_shape[0], to_shape[1])
