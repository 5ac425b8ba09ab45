"""DETR-style loss for RT-DETR (reference: models/utils/loss.py ``DETRLoss`` +
``HungarianMatcher``; models/utils/ops.py).

Fixed-shape JAX: the (B, Q, M) cost tensor is computed on device; the
Hungarian assignment runs through ``jax.pure_callback`` into scipy's LAP with
static shapes (Q=300, M=max_boxes), returning per-GT matched query indices.
Class loss is sigmoid focal (gamma 1.5, alpha 0.25), box losses are L1 + GIoU,
auxiliary losses sum over every decoder layer and the encoder proposals.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_iou, xywh2xyxy

COST_GAIN = {"class": 2.0, "bbox": 5.0, "giou": 2.0}
LOSS_GAIN = {"class": 1.0, "bbox": 5.0, "giou": 2.0}


def _host_lap(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """cost (B, Q, M), valid (B, M) -> matched query index per GT (B, M)."""
    from scipy.optimize import linear_sum_assignment

    B, Q, M = cost.shape
    out = np.zeros((B, M), np.int32)
    for b in range(B):
        m = int(valid[b].sum())
        if m == 0:
            continue
        c = cost[b, :, :m]
        rows, cols = linear_sum_assignment(np.nan_to_num(c, nan=1e6, posinf=1e6))
        for r, cc in zip(rows, cols):
            out[b, cc] = r
    return out


def hungarian_match(
    pred_bboxes: jax.Array,  # (B, Q, 4) xywh normalized
    pred_scores: jax.Array,  # (B, Q, C) logits
    gt_bboxes: jax.Array,    # (B, M, 4) xywh normalized
    gt_labels: jax.Array,    # (B, M) int
    mask_gt: jax.Array,      # (B, M)
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Reference HungarianMatcher.forward (models/utils/loss.py:345+): focal
    class cost + L1 + GIoU. Returns (B, M) matched query indices."""
    B, Q, C = pred_scores.shape
    M = gt_bboxes.shape[1]
    p = jax.nn.sigmoid(pred_scores.astype(jnp.float32))
    sel = jnp.take_along_axis(
        p[:, :, None, :], jnp.clip(gt_labels, 0, C - 1)[:, None, :, None], axis=-1
    )[..., 0]  # (B, Q, M)
    neg = (1 - alpha) * (sel**gamma) * (-jnp.log(1 - sel + 1e-8))
    pos = alpha * ((1 - sel) ** gamma) * (-jnp.log(sel + 1e-8))
    cost_class = pos - neg

    l1 = jnp.abs(pred_bboxes[:, :, None] - gt_bboxes[:, None, :]).sum(-1)
    giou = bbox_iou(
        xywh2xyxy(pred_bboxes[:, :, None]), xywh2xyxy(gt_bboxes[:, None, :]),
        xywh=False, giou=True,
    )[..., 0]
    cost = (
        COST_GAIN["class"] * cost_class
        + COST_GAIN["bbox"] * l1
        + COST_GAIN["giou"] * (1 - giou)
    )
    cost = jnp.where(mask_gt[:, None, :], cost, 1e6)
    return _lap_nondiff(cost, mask_gt)


@jax.custom_vjp
def _lap_nondiff(cost: jax.Array, mask_gt: jax.Array) -> jax.Array:
    """Discrete assignment — constant w.r.t. differentiation (the reference
    matcher runs under no_grad)."""
    B, Q, M = cost.shape
    return jax.pure_callback(
        _host_lap,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        cost,
        mask_gt,
        vmap_method="sequential",
    )


def _lap_fwd(cost, mask_gt):
    return _lap_nondiff(cost, mask_gt), (cost, mask_gt)


def _lap_bwd(res, g):
    cost, mask_gt = res
    return jnp.zeros_like(cost), jnp.zeros_like(mask_gt)


_lap_nondiff.defvjp(_lap_fwd, _lap_bwd)


def _focal(logits, targets_onehot, alpha=0.25, gamma=1.5):
    """Sigmoid focal loss, summed (reference utils/loss.py FocalLoss)."""
    p = jax.nn.sigmoid(logits)
    bce = jnp.clip(logits, 0, None) - logits * targets_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = targets_onehot * p + (1 - targets_onehot) * (1 - p)
    mod = (1.0 - p_t) ** gamma
    alpha_t = targets_onehot * alpha + (1 - targets_onehot) * (1 - alpha)
    return (bce * mod * alpha_t).sum()


def _single_layer_loss(pred_bboxes, pred_scores, gt_bboxes, gt_labels, mask_gt, matched):
    B, Q, C = pred_scores.shape
    M = gt_bboxes.shape[1]
    num_gts = jnp.maximum(mask_gt.sum(), 1)

    # class targets: background everywhere, GT class at matched queries
    targets = jnp.full((B, Q), C, jnp.int32)
    safe_lab = jnp.where(mask_gt, jnp.clip(gt_labels, 0, C - 1), C)
    # scatter: targets[b, matched[b, m]] = label[b, m] for valid m
    bidx = jnp.arange(B)[:, None]
    targets = targets.at[bidx, matched].set(
        jnp.where(mask_gt, safe_lab, targets[bidx, matched])
    )
    one_hot = jax.nn.one_hot(targets, C + 1)[..., :-1]
    loss_class = _focal(pred_scores.astype(jnp.float32), one_hot)
    loss_class = loss_class / (num_gts / Q) * LOSS_GAIN["class"]

    matched_boxes = jnp.take_along_axis(pred_bboxes, matched[..., None], axis=1)
    vf = mask_gt[..., None].astype(jnp.float32)
    l1 = (jnp.abs(matched_boxes - gt_bboxes) * vf).sum() / num_gts * LOSS_GAIN["bbox"]
    giou = bbox_iou(
        xywh2xyxy(matched_boxes), xywh2xyxy(gt_bboxes), xywh=False, giou=True
    )[..., 0]
    loss_giou = (((1.0 - giou) * mask_gt).sum() / num_gts) * LOSS_GAIN["giou"]
    return loss_class, l1, loss_giou


def _dn_layer_loss(pred_bboxes, pred_scores, gt_bboxes, gt_labels, mask_gt, num_group):
    """Denoising loss with the FIXED assignment: dn slot i*M + j of the
    positive half is gt j of group i (reference RTDETRDetectionLoss
    get_dn_match_indices, models/utils/loss.py). Negatives stay background."""
    B, M = gt_labels.shape
    G = num_group
    gt_b = jnp.tile(gt_bboxes, (1, G, 1))
    gt_l = jnp.tile(gt_labels, (1, G))
    gt_m = jnp.tile(mask_gt, (1, G))
    matched = jnp.broadcast_to(jnp.arange(G * M)[None], (B, G * M))  # identity
    return _single_layer_loss(pred_bboxes, pred_scores, gt_b, gt_l, gt_m, matched)


def rtdetr_loss(
    preds: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    aux_loss: bool = True,
    dn_meta: Dict = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss over the head's train outputs: final decoder layer + auxiliary
    losses on earlier layers and encoder proposals (DETRLoss.forward). With
    dn_meta (train/cdn.py), decoder tensors carry D denoising queries in
    front; they get the fixed-assignment denoising loss on every layer
    (reference RTDETRDetectionLoss.forward, models/utils/loss.py)."""
    gt_bboxes = batch["gt_bboxes"].astype(jnp.float32)  # xywh normalized
    gt_labels = batch["gt_labels"].astype(jnp.int32)
    mask_gt = batch["mask_gt"]

    dec_b = preds["dec_bboxes"].astype(jnp.float32)  # (L, B, Q(+D), 4)
    dec_s = preds["dec_scores"].astype(jnp.float32)
    D = dn_meta["dn_num_split"][0] if dn_meta is not None else 0
    layers_b = [dec_b[i] for i in range(dec_b.shape[0])]
    layers_s = [dec_s[i] for i in range(dec_s.shape[0])]

    items = {}
    total = jnp.zeros(())
    idx_main = dec_b.shape[0] - 1
    for i, (pb, ps) in enumerate(zip(layers_b, layers_s)):
        if not aux_loss and i != idx_main:
            continue
        if D:
            dn_b, pb = pb[:, :D], pb[:, D:]
            dn_s, ps = ps[:, :D], ps[:, D:]
            lc_dn, lb_dn, lg_dn = _dn_layer_loss(
                dn_b, dn_s, gt_bboxes, gt_labels, mask_gt, dn_meta["dn_num_group"]
            )
            total = total + lc_dn + lb_dn + lg_dn
            if i == idx_main:
                items.update(
                    {"loss_class_dn": lc_dn, "loss_bbox_dn": lb_dn, "loss_giou_dn": lg_dn}
                )
        matched = hungarian_match(pb, ps, gt_bboxes, gt_labels, mask_gt)
        lc, lb, lg = _single_layer_loss(pb, ps, gt_bboxes, gt_labels, mask_gt, matched)
        total = total + lc + lb + lg
        if i == idx_main:
            items.update({"loss_class": lc, "loss_bbox": lb, "loss_giou": lg})

    if "enc_bboxes" in preds and aux_loss:
        pb = preds["enc_bboxes"].astype(jnp.float32)
        ps = preds["enc_scores"].astype(jnp.float32)
        matched = hungarian_match(pb, ps, gt_bboxes, gt_labels, mask_gt)
        lc, lb, lg = _single_layer_loss(pb, ps, gt_bboxes, gt_labels, mask_gt, matched)
        total = total + lc + lb + lg
    items["total"] = total
    return total, items
