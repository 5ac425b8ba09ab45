"""Detection losses (reference: ultralytics/utils/loss.py:157 ``v8DetectionLoss``,
:727 ``v10DetectLoss``).

Pure functions over padded fixed-shape targets. Batches carry per-image padded
GTs (TPU-friendly; the reference builds this padding on the fly in
v8DetectionLoss.preprocess, loss.py:181-196):
    batch = {
      "gt_labels": (B, M) int32, "gt_bboxes": (B, M, 4) xywh normalized [0,1],
      "mask_gt": (B, M) bool,
    }
All accumulation in fp32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.modules import dfl_decode
from ..ops.boxes import bbox2dist, bbox_iou, dist2bbox, make_anchors, xywh2xyxy
from ..ops.postprocess import flatten_feats
from .tal import assign

REG_MAX = 16


class DetLossAux(NamedTuple):
    box: jax.Array
    cls: jax.Array
    dfl: jax.Array


def _bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _df_loss(pred_dist: jax.Array, target: jax.Array) -> jax.Array:
    """Distribution-focal loss (reference loss.py:98 ``BboxLoss._df_loss``).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
    [0, reg_max-1). Returns (..., 1): mean over the 4 sides.

    TPU note: the two bin lookups are one fused one-hot contraction over the
    reg_max axis — dynamic gathers (take_along_axis) on the minor axis cost
    ~80 ms at (64, 8400, 4, 16) on v5e; the one-hot form is pure VPU math.
    """
    reg_max = pred_dist.shape[-1]
    tl = jnp.floor(target).astype(jnp.int32)
    tr = jnp.clip(tl + 1, 0, reg_max - 1)
    wl = (tl + 1).astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    w = (
        jax.nn.one_hot(tl, reg_max, dtype=logp.dtype) * wl[..., None]
        + jax.nn.one_hot(tr, reg_max, dtype=logp.dtype) * wr[..., None]
    )
    ce = -(logp * w).sum(-1)
    return ce.mean(-1, keepdims=True)


def detection_loss(
    feats: Sequence[jax.Array],
    batch: Dict[str, jax.Array],
    *,
    nc: int,
    strides: Sequence[int],
    gains: Tuple[float, float, float] = (7.5, 0.5, 1.5),
    tal_topk: int = 10,
    reg_max: int = REG_MAX,
) -> Tuple[jax.Array, DetLossAux]:
    """v8-style detection loss over raw head maps.

    gains = (box, cls, dfl) hyperparameters (default.yaml box/cls/dfl).
    Returns (total_loss * batch_size, per-term aux) like loss.py:255-257.
    """
    x, shapes = flatten_feats(feats)
    x = x.astype(jnp.float32)
    B, A, _ = x.shape
    pred_distri, pred_scores = x[..., : reg_max * 4], x[..., reg_max * 4 :]

    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)
    imgsz_h = shapes[0][0] * strides[0]
    imgsz_w = shapes[0][1] * strides[0]

    gt_labels = batch["gt_labels"]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["gt_bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask_gt"]
    # reference builds mask from bbox sum > 0 (loss.py:223)
    gt_bboxes = gt_bboxes * mask_gt[..., None]

    pred_dist_bins = pred_distri.reshape(B, A, 4, reg_max)
    pred_dist = dfl_decode(pred_distri, reg_max)              # (B,A,4) expectation
    pred_bboxes = dist2bbox(pred_dist, anchor_points[None], xywh=False)  # grid units

    res = assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
        alpha=0.5,
        beta=6.0,
    )

    target_scores_sum = jnp.maximum(res.target_scores.sum(), 1.0)

    # cls BCE (loss.py:239)
    loss_cls = _bce_logits(pred_scores, res.target_scores).sum() / target_scores_sum

    # box CIoU + DFL on foreground (loss.py:81-96)
    fg = res.fg_mask
    weight = res.target_scores.sum(-1) * fg                   # (B,A)
    target_bboxes = res.target_bboxes / stride_tensor[None]
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, ciou=True)[..., 0]
    loss_box = (((1.0 - iou) * weight) * fg).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    dfl = _df_loss(pred_dist_bins, target_ltrb)[..., 0]       # (B,A)
    loss_dfl = ((dfl * weight) * fg).sum() / target_scores_sum

    box_g, cls_g, dfl_g = gains
    aux = DetLossAux(loss_box * box_g, loss_cls * cls_g, loss_dfl * dfl_g)
    total = (aux.box + aux.cls + aux.dfl) * B
    return total, aux


def v10_detect_loss(
    preds: Dict[str, Sequence[jax.Array]],
    batch: Dict[str, jax.Array],
    *,
    nc: int,
    strides: Sequence[int],
    gains: Tuple[float, float, float] = (7.5, 0.5, 1.5),
    one2many_topk: int = 10,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Consistent dual assignment loss (reference loss.py:727 ``v10DetectLoss``):
    one2many branch with topk=10 + one2one branch with topk=1, summed."""
    l_m, aux_m = detection_loss(
        preds["one2many"], batch, nc=nc, strides=strides, gains=gains, tal_topk=one2many_topk
    )
    l_o, aux_o = detection_loss(
        preds["one2one"], batch, nc=nc, strides=strides, gains=gains, tal_topk=1
    )
    aux = {
        "box_om": aux_m.box, "cls_om": aux_m.cls, "dfl_om": aux_m.dfl,
        "box_oo": aux_o.box, "cls_oo": aux_o.cls, "dfl_oo": aux_o.dfl,
    }
    return l_m + l_o, aux


def pad_targets(
    batch_idx, cls, bboxes, batch_size: int, max_boxes: int
):
    """Flat ultralytics-style targets -> padded (B, M, ...) arrays (host-side
    numpy; equivalent of v8DetectionLoss.preprocess, loss.py:181-196)."""
    import numpy as np

    gt_labels = np.zeros((batch_size, max_boxes), np.int32)
    gt_bboxes = np.zeros((batch_size, max_boxes, 4), np.float32)
    mask = np.zeros((batch_size, max_boxes), bool)
    for b in range(batch_size):
        sel = np.asarray(batch_idx) == b
        n = min(int(sel.sum()), max_boxes)
        if n:
            gt_labels[b, :n] = np.asarray(cls)[sel][:n].reshape(-1)
            gt_bboxes[b, :n] = np.asarray(bboxes)[sel][:n]
            mask[b, :n] = True
    return gt_labels, gt_bboxes, mask
