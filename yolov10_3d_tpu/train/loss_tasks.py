"""Task losses for segmentation / pose / OBB / classification (reference:
loss.py:260 ``v8SegmentationLoss``, :448 ``v8PoseLoss``, :598
``v8ClassificationLoss``, :612 ``v8OBBLoss``).

Fixed-shape JAX: the reference boolean-indexes foreground anchors; here the
foreground set is compacted into a fixed budget of K = topk * max_boxes slots
(the assigner can never produce more positives than that), so the mask/kpt
losses run on dense (B, K, ...) tensors.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.modules import dfl_decode
from ..ops.boxes import bbox2dist, dist2bbox, make_anchors, probiou, xywh2xyxy, xyxy2xywh
from ..ops.postprocess import flatten_feats
from .loss import _bce_logits, _df_loss
from .tal import AssignResult, assign, select_candidates_in_gts, _topk_mask

OKS_SIGMA = (
    np.array(
        [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
         1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
    )
    / 10.0
)


def gather_fg(fg_mask: jax.Array, budget: int) -> Tuple[jax.Array, jax.Array]:
    """Compact foreground anchor indices into (B, budget) + validity."""
    B, A = fg_mask.shape
    rank = jnp.where(fg_mask, jnp.arange(A)[None, :], A + 1)
    order = jnp.argsort(rank, axis=1)[:, :budget]
    valid = jnp.take_along_axis(fg_mask, order, axis=1)
    return order, valid


def _detection_core(feats, batch, nc, strides, tal_topk=10, reg_max=16):
    """Shared decode + assignment used by all det-based task losses."""
    x, shapes = flatten_feats(feats)
    x = x.astype(jnp.float32)
    B, A, _ = x.shape
    pred_distri, pred_scores = x[..., : reg_max * 4], x[..., reg_max * 4 :]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)
    imgsz_h = shapes[0][0] * strides[0]
    imgsz_w = shapes[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["gt_bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask_gt"]
    gt_bboxes = gt_bboxes * mask_gt[..., None]
    pred_dist_bins = pred_distri.reshape(B, A, 4, reg_max)
    pred_dist = dfl_decode(pred_distri, reg_max)
    pred_bboxes = dist2bbox(pred_dist, anchor_points[None], xywh=False)
    res = assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        batch["gt_labels"],
        gt_bboxes,
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
    )
    return dict(
        pred_scores=pred_scores, pred_dist_bins=pred_dist_bins,
        pred_bboxes=pred_bboxes, anchor_points=anchor_points,
        stride_tensor=stride_tensor, res=res,
        imgsz=(imgsz_h, imgsz_w), B=B, A=A,
    )


def _box_dfl_cls(core, gains, reg_max=16):
    """box CIoU + DFL + cls BCE terms shared with detection_loss."""
    from ..ops.boxes import bbox_iou

    res: AssignResult = core["res"]
    tss = jnp.maximum(res.target_scores.sum(), 1.0)
    loss_cls = _bce_logits(core["pred_scores"], res.target_scores).sum() / tss
    fg = res.fg_mask
    weight = res.target_scores.sum(-1) * fg
    tb = res.target_bboxes / core["stride_tensor"][None]
    iou = bbox_iou(core["pred_bboxes"], tb, xywh=False, ciou=True)[..., 0]
    loss_box = (((1.0 - iou) * weight) * fg).sum() / tss
    tl = bbox2dist(core["anchor_points"][None], tb, reg_max - 1)
    dfl = _df_loss(core["pred_dist_bins"], tl)[..., 0]
    loss_dfl = ((dfl * weight) * fg).sum() / tss
    return loss_box, loss_cls, loss_dfl, tss


def segmentation_loss(
    preds: Dict, batch: Dict, *, nc: int, strides: Sequence[int],
    gains=(7.5, 0.5, 1.5), tal_topk: int = 10, fg_budget: int = 0,
):
    """v8SegmentationLoss: detection terms + per-instance BCE mask loss
    (crop to box, mean / box area). batch adds gt_masks (B, M, Hm, Wm) binary
    per-object masks at proto resolution."""
    core = _detection_core(preds["det"], batch, nc, strides, tal_topk)
    res: AssignResult = core["res"]
    loss_box, loss_cls, loss_dfl, tss = _box_dfl_cls(core, gains)

    protos = preds["protos"].astype(jnp.float32)      # (B, Hm, Wm, nm)
    B, Hm, Wm, nm = protos.shape
    mc, _ = flatten_feats(preds["mask_coefs"])        # (B, A, nm)
    M = batch["gt_masks"].shape[1]
    K = fg_budget or min(core["A"], tal_topk * M)
    idx, valid = gather_fg(res.fg_mask, K)
    coefs = jnp.take_along_axis(mc.astype(jnp.float32), idx[..., None], axis=1)  # (B,K,nm)
    tgi = jnp.take_along_axis(res.target_gt_idx, idx, axis=1)                    # (B,K)
    tboxes = jnp.take_along_axis(res.target_bboxes, idx[..., None], axis=1)      # (B,K,4) px
    gt_masks = jnp.take_along_axis(
        batch["gt_masks"].astype(jnp.float32), tgi[..., None, None], axis=1
    )  # (B,K,Hm,Wm)

    imgsz_h, imgsz_w = core["imgsz"]
    norm = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    nxyxy = tboxes / norm
    marea = jnp.clip((nxyxy[..., 2] - nxyxy[..., 0]) * (nxyxy[..., 3] - nxyxy[..., 1]), 1e-7)
    mxyxy = nxyxy * jnp.array([Wm, Hm, Wm, Hm], jnp.float32)

    pred_masks = jnp.einsum("bkn,bhwn->bkhw", coefs, protos)  # logits
    bce = _bce_logits(pred_masks, gt_masks)
    cols = jnp.arange(Wm)[None, None, None, :]
    rows = jnp.arange(Hm)[None, None, :, None]
    crop = (
        (cols >= mxyxy[..., 0, None, None]) & (cols < mxyxy[..., 2, None, None])
        & (rows >= mxyxy[..., 1, None, None]) & (rows < mxyxy[..., 3, None, None])
    ).astype(jnp.float32)
    per_inst = (bce * crop).mean((-1, -2)) / marea            # (B,K)
    n_fg = jnp.maximum(res.fg_mask.sum(), 1)
    loss_seg = (per_inst * valid).sum() / n_fg

    box_g, cls_g, dfl_g = gains
    items = {
        "box": loss_box * box_g, "seg": loss_seg * box_g,
        "cls": loss_cls * cls_g, "dfl": loss_dfl * dfl_g,
    }
    return sum(items.values()) * core["B"], items


def pose_loss(
    preds: Dict, batch: Dict, *, nc: int, strides: Sequence[int],
    kpt_shape=(17, 3), gains=(7.5, 0.5, 1.5), pose_gain=12.0, kobj_gain=1.0,
    tal_topk: int = 10, fg_budget: int = 0,
):
    """v8PoseLoss: detection terms + OKS-style keypoint loss + visibility BCE.
    batch adds gt_kpts (B, M, nk, nd) normalized [0,1] coords (+vis)."""
    core = _detection_core(preds["det"], batch, nc, strides, tal_topk)
    res: AssignResult = core["res"]
    loss_box, loss_cls, loss_dfl, tss = _box_dfl_cls(core, gains)

    nk, nd = kpt_shape
    kp, _ = flatten_feats(preds["kpts"])  # (B, A, nk*nd) raw
    B, A = core["B"], core["A"]
    anchor = core["anchor_points"]
    strd = core["stride_tensor"]
    y = kp.astype(jnp.float32).reshape(B, A, nk, nd)
    xy = y[..., :2] * 2.0 + (anchor[None, :, None, :] - 0.5)  # grid units
    pred_kpts = jnp.concatenate([xy, y[..., 2:]], -1) if nd == 3 else xy

    M = batch["gt_kpts"].shape[1]
    K = fg_budget or min(A, tal_topk * M)
    idx, valid = gather_fg(res.fg_mask, K)
    tgi = jnp.take_along_axis(res.target_gt_idx, idx, axis=1)
    imgsz_h, imgsz_w = core["imgsz"]
    gk = batch["gt_kpts"].astype(jnp.float32)
    gk = gk.at[..., 0].multiply(imgsz_w).at[..., 1].multiply(imgsz_h)
    sel_kpts = jnp.take_along_axis(gk, tgi[..., None, None], axis=1)  # (B,K,nk,nd) px
    strd_k = jnp.take_along_axis(jnp.broadcast_to(strd.T, (B, A)), idx, axis=1)
    sel_kpts = sel_kpts.at[..., :2].divide(strd_k[..., None, None])
    pk = jnp.take_along_axis(pred_kpts, idx[..., None, None], axis=1)
    tb = jnp.take_along_axis(res.target_bboxes / strd[None], idx[..., None], axis=1)
    area = jnp.clip((tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]), 1e-9)

    kpt_mask = (sel_kpts[..., 2] != 0) if nd == 3 else jnp.ones(sel_kpts.shape[:-1], bool)
    kpt_mask = kpt_mask & valid[..., None]
    sigmas = jnp.asarray(OKS_SIGMA if nk == 17 else np.ones(nk) / nk, jnp.float32)
    d = ((pk[..., 0] - sel_kpts[..., 0]) ** 2 + (pk[..., 1] - sel_kpts[..., 1]) ** 2)
    e = d / ((2 * sigmas) ** 2 * (area[..., None] + 1e-9) * 2)
    factor = nk / jnp.maximum(kpt_mask.sum(-1, keepdims=True), 1e-9)
    # reference KeypointLoss (loss.py:140): mean over the fg selection
    per_el = factor * (1 - jnp.exp(-e)) * kpt_mask
    n_sel = jnp.maximum(valid.sum() * nk, 1)
    loss_kpt = per_el.sum() / n_sel

    if nd == 3:
        vis_bce = _bce_logits(pk[..., 2], kpt_mask.astype(jnp.float32))
        loss_kobj = (vis_bce * valid[..., None]).sum() / n_sel
    else:
        loss_kobj = jnp.zeros(())

    box_g, cls_g, dfl_g = gains
    items = {
        "box": loss_box * box_g, "pose": loss_kpt * pose_gain,
        "kobj": loss_kobj * kobj_gain, "cls": loss_cls * cls_g,
        "dfl": loss_dfl * dfl_g,
    }
    return sum(items.values()) * B, items


def classification_loss(logits: jax.Array, labels: jax.Array):
    """v8ClassificationLoss: plain mean CE (loss.py:598)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1).mean()
    return loss, {"cls": loss}


def obb_loss(
    preds: Dict, batch: Dict, *, nc: int, strides: Sequence[int],
    gains=(7.5, 0.5, 1.5), tal_topk: int = 10, reg_max: int = 16,
):
    """v8OBBLoss (loss.py:612): rotated assigner (probiou metric) + probiou
    box loss + DFL. batch gt_bboxes are (B, M, 5) normalized xywh + radians."""
    feats = preds["det"]
    x, shapes = flatten_feats(feats)
    x = x.astype(jnp.float32)
    B, A, _ = x.shape
    pred_distri, pred_scores = x[..., : reg_max * 4], x[..., reg_max * 4 :]
    angle_flat, _ = flatten_feats(preds["angle"])
    pred_angle = (jax.nn.sigmoid(angle_flat.astype(jnp.float32)) - 0.25) * math.pi

    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)
    imgsz_h = shapes[0][0] * strides[0]
    imgsz_w = shapes[0][1] * strides[0]
    gt = batch["gt_bboxes"].astype(jnp.float32)
    gt_xywh = gt[..., :4] * jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_rbox = jnp.concatenate([gt_xywh, gt[..., 4:5]], -1)   # (B,M,5) px
    mask_gt = batch["mask_gt"]

    # decode rotated pred boxes (tal.py:339 dist2rbox)
    pred_dist_bins = pred_distri.reshape(B, A, 4, reg_max)
    dist = dfl_decode(pred_distri, reg_max)
    lt, rb = dist[..., :2], dist[..., 2:]
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf = (rb[..., 0:1] - lt[..., 0:1]) / 2
    yf = (rb[..., 1:2] - lt[..., 1:2]) / 2
    xr = xf * cos - yf * sin
    yr = xf * sin + yf * cos
    pred_rbox = jnp.concatenate(
        [xr + anchor_points[None, :, 0:1], yr + anchor_points[None, :, 1:2],
         lt + rb, pred_angle], -1,
    )  # grid units + angle

    # rotated assignment: probiou metric + center-in-rotated-gt candidates
    pd_scores = jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores))
    pd_rbox_px = jax.lax.stop_gradient(
        jnp.concatenate(
            [pred_rbox[..., :4] * stride_tensor[None], pred_rbox[..., 4:]], -1
        )
    )
    anc_px = anchor_points * stride_tensor
    # candidates: anchor center inside rotated gt (tal.py:267-297)
    c, s2 = jnp.cos(gt_rbox[..., 4]), jnp.sin(gt_rbox[..., 4])
    rel = anc_px[None, None] - gt_rbox[..., None, :2]
    loc_x = rel[..., 0] * c[..., None] + rel[..., 1] * s2[..., None]
    loc_y = -rel[..., 0] * s2[..., None] + rel[..., 1] * c[..., None]
    in_gts = (
        (jnp.abs(loc_x) <= gt_rbox[..., None, 2] / 2)
        & (jnp.abs(loc_y) <= gt_rbox[..., None, 3] / 2)
    ).astype(jnp.float32)
    mask_valid = in_gts * mask_gt[..., None].astype(jnp.float32)
    labels = jnp.clip(batch["gt_labels"].astype(jnp.int32), 0, nc - 1)
    bbox_scores = jnp.take_along_axis(
        pd_scores[:, None], labels[:, :, None, None], axis=-1
    )[..., 0]
    bbox_scores = jnp.where(mask_valid > 0, bbox_scores, 0.0)
    overlaps = probiou(gt_rbox[:, :, None], pd_rbox_px[:, None, :])
    overlaps = jnp.where(mask_valid > 0, jnp.clip(overlaps, 0.0), 0.0)
    align = bbox_scores**0.5 * overlaps**6.0
    mask_topk = _topk_mask(align, tal_topk, mask_gt > 0)
    mask_pos = mask_topk * mask_valid
    fg_counts = mask_pos.sum(-2)
    is_max = jax.nn.one_hot(overlaps.argmax(1), gt_rbox.shape[1], dtype=mask_pos.dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(fg_counts[:, None, :] > 1, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2) > 0
    tgi = mask_pos.argmax(-2).astype(jnp.int32)
    t_labels = jnp.take_along_axis(labels, tgi, axis=1)
    t_rbox = jnp.take_along_axis(gt_rbox, tgi[..., None], axis=1)
    t_scores = jax.nn.one_hot(t_labels, nc) * fg_mask[..., None]
    align = align * mask_pos
    norm = (align * (overlaps * mask_pos).max(-1, keepdims=True)
            / (align.max(-1, keepdims=True) + 1e-9)).max(-2)[..., None]
    t_scores = t_scores * norm

    tss = jnp.maximum(t_scores.sum(), 1.0)
    loss_cls = _bce_logits(pred_scores, t_scores).sum() / tss
    weight = t_scores.sum(-1) * fg_mask
    t_rbox_grid = jnp.concatenate(
        [t_rbox[..., :4] / stride_tensor[None], t_rbox[..., 4:]], -1
    )
    iou = probiou(pred_rbox, t_rbox_grid)
    loss_box = ((1.0 - iou) * weight).sum() / tss
    # DFL against the axis-aligned hull of the rotated target (loss.py:131)
    t_xyxy = xywh2xyxy(t_rbox_grid[..., :4])
    tl_d = bbox2dist(anchor_points[None], t_xyxy, reg_max - 1)
    dflv = _df_loss(pred_dist_bins, tl_d)[..., 0]
    loss_dfl = ((dflv * weight) * fg_mask).sum() / tss

    box_g, cls_g, dfl_g = gains
    items = {"box": loss_box * box_g, "cls": loss_cls * cls_g, "dfl": loss_dfl * dfl_g}
    return sum(items.values()) * B, items
