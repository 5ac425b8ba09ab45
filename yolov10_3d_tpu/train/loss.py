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


@jax.custom_vjp
def _bce_logits_sum(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """``_bce_logits(...).sum()`` with an analytic VJP.

    TPU note: autodiff of the log1p/exp/abs chain makes XLA keep several
    (B, A, C) f32 intermediates as backward residuals — at B=128 that is
    ~344 MB per array per branch, and under the train step's HBM pressure the
    cls term measured +35 ms in-step (vs 1.2 ms isolated; tools/
    exp_loss_slice.py). The closed form d/dlogits = sigmoid(logits) - targets
    needs only the already-live logits/targets, so the backward is one fused
    elementwise pass and no extra residuals survive the forward.
    """
    return _bce_logits(logits, targets).sum()


def _bce_sum_fwd(logits, targets):
    return _bce_logits_sum(logits, targets), (logits, targets)


def _bce_sum_bwd(res, g):
    logits, targets = res
    d_logits = g * (jax.nn.sigmoid(logits) - targets)
    # true VJP wrt targets (-g * logits); reaches only stop_gradient'd
    # assigner outputs in this loss, but keep it correct for any caller
    return d_logits, -g * logits


_bce_logits_sum.defvjp(_bce_sum_fwd, _bce_sum_bwd)


def _df_loss(pred_dist: jax.Array, target: jax.Array) -> jax.Array:
    """Distribution-focal loss (reference loss.py:98 ``BboxLoss._df_loss``).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
    [0, reg_max-1). Returns (..., 1): mean over the 4 sides.

    TPU note: the two bin lookups are one fused one-hot contraction over the
    reg_max axis — dynamic gathers (take_along_axis) on the minor axis cost
    ~80 ms at (64, 8400, 4, 16) on v5e; the one-hot form is pure VPU math.
    """
    reg_max = pred_dist.shape[-1]
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # single definition of the two-bin targets, shared with _df_loss_fast's
    # analytic backward — editing the interpolation in one place only would
    # silently desynchronize forward and gradient
    w = _df_weights(target, reg_max, logp.dtype)
    ce = -(logp * w).sum(-1)
    return ce.mean(-1, keepdims=True)


def _df_weights(target: jax.Array, reg_max: int, dtype) -> jax.Array:
    """Interpolated two-bin one-hot targets of _df_loss, (..., 4, reg_max)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = jnp.clip(tl + 1, 0, reg_max - 1)
    wl = (tl + 1).astype(target.dtype) - target
    wr = 1.0 - wl
    return (
        jax.nn.one_hot(tl, reg_max, dtype=dtype) * wl[..., None]
        + jax.nn.one_hot(tr, reg_max, dtype=dtype) * wr[..., None]
    )


@jax.custom_vjp
def _df_loss_fast(pred_dist: jax.Array, target: jax.Array) -> jax.Array:
    """_df_loss with an analytic VJP (same value, same gradient).

    The weights w sum to 1 over the bin axis, so the cross-entropy gradient
    collapses to d/dz = (softmax(z) - w) / 4 (mean over the 4 sides) — the
    backward recomputes softmax from the logits instead of storing the
    (B, A, 4, reg_max) log_softmax + one-hot residuals (~275 MB each at
    B=128) that autodiff would keep across the whole model backward.
    """
    return _df_loss(pred_dist, target)


def _df_fast_fwd(pred_dist, target):
    return _df_loss_fast(pred_dist, target), (pred_dist, target)


def _df_fast_bwd(res, g):
    pred_dist, target = res
    reg_max = pred_dist.shape[-1]
    w = _df_weights(target, reg_max, pred_dist.dtype)
    # g: (..., 1) cotangent of the per-anchor mean; broadcast over 4 sides
    d = (g[..., None] / 4.0) * (jax.nn.softmax(pred_dist, axis=-1) - w)
    # targets are assigner outputs (non-differentiable in every caller, as in
    # the reference where they're detached tensors) — declare zero cotangent
    return d, jnp.zeros_like(target)


_df_loss_fast.defvjp(_df_fast_fwd, _df_fast_bwd)


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

    # cls BCE (loss.py:239) — analytic-VJP sum (see _bce_logits_sum)
    loss_cls = _bce_logits_sum(pred_scores, res.target_scores) / target_scores_sum

    # box CIoU + DFL on foreground (loss.py:81-96). jax.checkpoint: the CIoU
    # chain is ~20 elementwise (B,A) intermediates; recompute them in the
    # backward from (pred_bboxes, targets) instead of keeping residuals —
    # free FLOPs vs HBM traffic under the train step's memory pressure.
    fg = res.fg_mask
    weight = res.target_scores.sum(-1) * fg                   # (B,A)
    target_bboxes = res.target_bboxes / stride_tensor[None]

    @jax.checkpoint
    def _box_term(pb, tb, w, f):
        iou = bbox_iou(pb, tb, xywh=False, ciou=True)[..., 0]
        return (((1.0 - iou) * w) * f).sum()

    loss_box = _box_term(pred_bboxes, target_bboxes, weight, fg) / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    dfl = _df_loss_fast(pred_dist_bins, target_ltrb)[..., 0]  # (B,A)
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
