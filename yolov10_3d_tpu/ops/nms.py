"""Non-maximum suppression (reference: utils/ops.py:163
``non_max_suppression``) — used by the v8-family heads (the v10 path is
NMS-free).

Fixed-shape greedy NMS in pure JAX: pre-select top-K by confidence, compute
the KxK IoU matrix once, then a fori_loop suppression sweep — O(K^2) dense
work that XLA vectorizes, no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import box_iou_pairwise, xywh2xyxy


def nms_fixed(
    boxes: jax.Array,   # (K, 4) xyxy, conf-sorted descending
    scores: jax.Array,  # (K,)
    iou_thres: float = 0.7,
) -> jax.Array:
    """Greedy suppression keep-mask over conf-sorted candidates."""
    K = boxes.shape[0]
    iou = box_iou_pairwise(boxes, boxes)

    def body(i, keep):
        # i suppresses lower-scored j>i if IoU > thresh and i itself is kept
        row = (iou[i] > iou_thres) & (jnp.arange(K) > i) & keep[i]
        return keep & ~row

    keep = jax.lax.fori_loop(0, K, body, jnp.ones(K, bool))
    return keep


def non_max_suppression(
    preds: jax.Array,          # (B, A, 4 + nc) xywh boxes + class scores
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    pre_topk: int = 1024,
    agnostic: bool = False,
    max_wh: float = 7680.0,
    extra: jax.Array = None,   # (B, A, E) per-anchor payload to carry through
) -> Tuple[jax.Array, ...]:
    """Batched fixed-shape NMS. Returns (boxes xyxy (B,max_det,4), scores,
    labels, valid) padded with zeros/False; with `extra` given, a fifth
    (B, max_det, E) array gathers the payload of the kept detections (the
    reference keeps mask coefs / kpts / angle columns concatenated onto the
    prediction rows through NMS, ops.py:163)."""
    nc = preds.shape[-1] - 4
    boxes_xywh, cls_scores = preds[..., :4], preds[..., 4:]
    scores = cls_scores.max(-1)
    labels = cls_scores.argmax(-1)

    k = min(pre_topk, preds.shape[1])
    top_scores, idx = jax.lax.top_k(scores, k)
    boxes = jnp.take_along_axis(xywh2xyxy(boxes_xywh), idx[..., None], axis=1)
    top_labels = jnp.take_along_axis(labels, idx, axis=1)
    conf_ok = top_scores > conf_thres
    # class-offset trick for per-class NMS (reference ops.py:252)
    offset = 0.0 if agnostic else top_labels.astype(boxes.dtype)[..., None] * max_wh
    shifted = boxes + offset
    # zero-out sub-threshold rows so they can't suppress anything
    shifted = jnp.where(conf_ok[..., None], shifted, -max_wh * 100)

    keep = jax.vmap(lambda b, s: nms_fixed(b, s, iou_thres))(shifted, top_scores)
    keep = keep & conf_ok

    # compact the kept detections to the front, pad to max_det
    rank = jnp.where(keep, jnp.arange(k)[None, :], k + 1)
    order = jnp.argsort(rank, axis=1)[:, :max_det]
    out_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    out_scores = jnp.take_along_axis(top_scores, order, axis=1)
    out_labels = jnp.take_along_axis(top_labels, order, axis=1)
    out_valid = jnp.take_along_axis(keep, order, axis=1)
    out_boxes = out_boxes * out_valid[..., None]
    out_extra = None
    if extra is not None:
        top_extra = jnp.take_along_axis(extra, idx[..., None], axis=1)
        out_extra = jnp.take_along_axis(top_extra, order[..., None], axis=1)
        out_extra = out_extra * out_valid[..., None]
    if max_det > order.shape[1]:
        pad = max_det - order.shape[1]
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
        out_labels = jnp.pad(out_labels, ((0, 0), (0, pad)))
        out_valid = jnp.pad(out_valid, ((0, 0), (0, pad)))
        if out_extra is not None:
            out_extra = jnp.pad(out_extra, ((0, 0), (0, pad), (0, 0)))
    if out_extra is not None:
        return out_boxes, out_scores * out_valid, out_labels, out_valid, out_extra
    return out_boxes, out_scores * out_valid, out_labels, out_valid


def nms_numpy(boxes, scores, iou_thres=0.7):
    """Host greedy NMS over xyxy boxes sorted or unsorted; returns kept idx."""
    import numpy as np

    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-9)
        suppressed |= iou > iou_thres
        suppressed[i] = True
    return np.array(keep, int)
