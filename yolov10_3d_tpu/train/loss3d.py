"""3D detection losses (reference: loss.py:740 ``DetectLoss3d``,
:774 ``DDDetectionLoss``, :1111 ``laplacian_aleatoric_uncertainty_loss_new``,
:1121 ``compute_heading_loss``).

Batch layout (padded per-image, host-collated; reference builds the same
padding on the fly in DDDetectionLoss.preprocess, loss.py:796-811):
    gt_labels (B,M), gt_bboxes (B,M,4) xywh normalized, gt_center_2d (B,M,2)
    px, gt_size_2d (B,M,2) px, gt_center_3d (B,M,2) px, gt_size_3d (B,M,3)
    residual vs class mean, gt_depth (B,M), gt_heading_bin (B,M),
    gt_heading_res (B,M), mask_gt (B,M), calib (B,6), mean_sizes (C,3).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import make_anchors, xywh2xyxy
from ..ops.postprocess import flatten_feats
from .loss import _bce_logits_sum
from .tal3d import assign3d

SPLITS = (2, 2, 2, 3, 24, 1, 1)  # o2d, s2d, o3d, s3d, hd, dep, dep_un


def laplacian_aleatoric_loss(pred, target, log_variance):
    """MonoPair-style aleatoric depth loss (loss.py:1111)."""
    return 1.4142 * jnp.exp(-0.5 * log_variance) * jnp.abs(pred - target) + 0.5 * log_variance


def heading_loss(pred_hd, target_bin, target_res, fg):
    """12-bin CE + selected-bin residual L1, both summed (loss.py:1121).
    One-hot contractions, not gathers (see _df_loss note in train/loss.py)."""
    logits = pred_hd[..., :12]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tbin = jnp.clip(target_bin.astype(jnp.int32), 0, 11)
    onehot = jax.nn.one_hot(tbin, 12, dtype=pred_hd.dtype)
    ce = -(logp * onehot).sum(-1)
    pred_res = (pred_hd[..., 12:24] * onehot).sum(-1)
    l1 = jnp.abs(pred_res - target_res)
    return ((ce + l1) * fg).sum()


def dd_detection_loss(
    feats: Sequence[jax.Array],
    batch: Dict[str, jax.Array],
    *,
    nc: int,
    strides: Sequence[int],
    hyp: Dict[str, float],
    tal_topk: int = 8,
    return_aux: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single-branch 3D loss (DDDetectionLoss.__call__, loss.py:825-963).
    Returns (total * batch_size, {box2d, cls, dep, o3d, s3d, hd}); with
    ``return_aux`` also the assignment (fg_mask/target_gt_idx) for the
    distillation hook (loss.py:893-898 passes them to SupervisionLoss)."""
    x, shapes = flatten_feats(feats)
    x = x.astype(jnp.float32)
    B, A, _ = x.shape
    pred_scores = x[..., :nc]
    pred_o2d, pred_s2d, pred_o3d, pred_s3d, pred_hd, pred_dep, pred_dep_un = jnp.split(
        x[..., nc:], [2, 4, 6, 9, 33, 34], axis=-1
    )
    pred_2d = jnp.concatenate([pred_o2d, pred_s2d], -1)
    pred_3d = jnp.concatenate([pred_o3d, pred_s3d, pred_hd, pred_dep, pred_dep_un], -1)

    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)
    imgsz_h = shapes[0][0] * strides[0]
    imgsz_w = shapes[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["gt_bboxes"].astype(jnp.float32) * scale)
    mask_gt = (gt_bboxes.sum(-1) > 0) & batch["mask_gt"]
    gt_bboxes = gt_bboxes * mask_gt[..., None]

    # decoded pred boxes for assignment (loss.py:813-819 ``bbox_decode``)
    centers = anchor_points[None] + pred_o2d
    xy1 = centers - pred_s2d / 2
    xy2 = centers + pred_s2d / 2
    pred_bboxes = jnp.concatenate([xy1, xy2], -1) * stride_tensor[None]

    gts = (
        batch["gt_labels"],
        gt_bboxes,
        batch["gt_center_2d"],
        batch["gt_size_2d"],
        batch["gt_center_3d"],
        batch["gt_size_3d"],
        batch["gt_depth"][..., None] if batch["gt_depth"].ndim == 2 else batch["gt_depth"],
        batch["gt_heading_bin"][..., None] if batch["gt_heading_bin"].ndim == 2 else batch["gt_heading_bin"],
        batch["gt_heading_res"][..., None] if batch["gt_heading_res"].ndim == 2 else batch["gt_heading_res"],
    )

    # host collation stacks the (identical) per-sample class mean-size table
    # to (B, C, 3); the assigner wants (C, 3)
    mean_sizes = batch["mean_sizes"]
    if mean_sizes.ndim == 3:
        mean_sizes = mean_sizes[0]

    res = assign3d(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes),
        jax.lax.stop_gradient(pred_3d),
        anchor_points * stride_tensor,
        gts,
        mask_gt,
        stride_tensor,
        batch["calib"].astype(jnp.float32),
        mean_sizes.astype(jnp.float32),
        topk=tal_topk,
        num_classes=nc,
        alpha=float(hyp.get("tal_alpha", 0.5)),
        beta=float(hyp.get("tal_beta", 1.0)),
        gamma=float(hyp.get("tal_gamma", 1.0)),
        use_2d=bool(hyp.get("tal_2d", True)),
        use_3d=bool(hyp.get("tal_3d", True)),
        kps_dist_metric=str(hyp.get("kps_dist_metric", "l1")),
        constrain_anchors=bool(hyp.get("constrain_anchors", True)),
    )

    fg = res.fg_mask.astype(jnp.float32)
    n_fg = jnp.maximum(fg.sum(), 1.0)
    target_scores_sum = jnp.maximum(res.target_scores.sum(), 1.0)

    # --- 2D: L1 on offset & size in pixels, means over fg elements, summed,
    # divided by target_scores_sum (loss.py:925-938)
    pred_2d_px = pred_2d * stride_tensor[None]
    anchor_px = anchor_points * stride_tensor
    t_off = res.target_center_2d - anchor_px[None]
    off_l1 = (jnp.abs(pred_2d_px[..., :2] - t_off) * fg[..., None]).sum() / (2 * n_fg)
    size_l1 = (jnp.abs(pred_2d_px[..., 2:] - res.target_size_2d) * fg[..., None]).sum() / (2 * n_fg)
    loss_box2d = (off_l1 + size_l1) / target_scores_sum * hyp.get("loss2d", 2.0)

    # --- cls BCE (analytic-VJP sum: no (B,A,C) backward residuals, see
    # train/loss.py _bce_logits_sum)
    loss_cls = (
        _bce_logits_sum(pred_scores, res.target_scores) / target_scores_sum
        * hyp.get("cls", 1.0)
    )

    # --- 3D (loss.py:966-1009 ``compute_box3d_loss``)
    dep = pred_dep[..., 0]
    dep_un = pred_dep_un[..., 0]
    loss_dep = (
        (laplacian_aleatoric_loss(dep, res.target_depth[..., 0], dep_un) * fg).sum()
        / target_scores_sum * hyp.get("depth", 1.0)
    )

    pred_off3d_px = pred_o3d * stride_tensor[None]
    t_off3d = res.target_center_3d - anchor_px[None]
    o3d_l1 = (jnp.abs(pred_off3d_px - t_off3d) * fg[..., None]).sum() / (2 * n_fg)
    loss_o3d = o3d_l1 / target_scores_sum * hyp.get("offset3d", 10.0)

    s3d_l1 = (jnp.abs(pred_s3d - res.target_size_3d) * fg[..., None]).sum()
    loss_s3d = s3d_l1 / target_scores_sum * hyp.get("size3d", 1.0)

    loss_hd = (
        heading_loss(pred_hd, res.target_heading_bin[..., 0], res.target_heading_res[..., 0], fg)
        / target_scores_sum * hyp.get("heading", 1.0)
    )

    items = {
        "box2d": loss_box2d, "cls": loss_cls, "dep": loss_dep,
        "o3d": loss_o3d, "s3d": loss_s3d, "hd": loss_hd,
    }
    total = sum(items.values()) * B
    if return_aux:
        aux = {"fg_mask": res.fg_mask, "target_gt_idx": res.target_gt_idx}
        return total, items, aux
    return total, items


# canonical item order for HTL weighting (utils/htl.py loss_graph order);
# total = htl_weights @ items when the trainer injects per-epoch weights
ITEM_KEYS = (
    "box2d_om", "cls_om", "dep_om", "o3d_om", "s3d_om", "hd_om",
    "box2d_oo", "cls_oo", "dep_oo", "o3d_oo", "s3d_oo", "hd_oo",
)
_BRANCH_KEYS = ("box2d", "cls", "dep", "o3d", "s3d", "hd")


def detect3d_loss(
    preds: Dict[str, Sequence[jax.Array]],
    batch: Dict[str, jax.Array],
    *,
    nc: int,
    strides: Sequence[int],
    hyp: Dict[str, float],
    fgdm_loss_fn=None,
    distill_fn=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Dual-branch 3D loss (DetectLoss3d, loss.py:740): o2m at tal_topk + o2o
    at topk=1, plus optional foreground-depth-map and distillation losses.

    When ``batch["htl_weights"]`` is present (a (12,) array in ITEM_KEYS
    order, injected per-epoch by the trainer), the dual-branch total becomes
    the weighted combination ``weights @ items`` like the reference's
    ``loss = loss_weights @ self.loss_items`` (trainer.py:399-400).

    ``distill_fn(preds, batch, aux_o2m)`` receives the o2m assignment so the
    SupervisionLoss can gather teacher features at assigned GT centers.
    """
    l_m, items_m, aux_m = dd_detection_loss(
        preds["one2many"], batch, nc=nc, strides=strides, hyp=hyp,
        tal_topk=int(hyp.get("tal_topk", 8)), return_aux=True,
    )
    l_o, items_o = dd_detection_loss(
        preds["one2one"], batch, nc=nc, strides=strides, hyp=hyp, tal_topk=1
    )
    items = {f"{k}_om": v for k, v in items_m.items()}
    items.update({f"{k}_oo": v for k, v in items_o.items()})
    if "htl_weights" in batch:
        B = preds["one2many"][0].shape[0]
        w = batch["htl_weights"].astype(jnp.float32)
        vec = jnp.stack(
            [items_m[k] for k in _BRANCH_KEYS] + [items_o[k] for k in _BRANCH_KEYS]
        )
        total = (w * vec).sum() * B
    else:
        total = l_m + l_o
    if fgdm_loss_fn is not None and "depth_maps" in preds and "depth_map" in batch:
        fgdm = fgdm_loss_fn(preds["depth_maps"][0], batch["depth_map"]) * hyp.get(
            "fgdm_loss_weight", 2.0
        )
        items["fgdm"] = fgdm
        total = total + fgdm
    if distill_fn is not None:
        dis = distill_fn(preds, batch, aux_m)
        items["dis"] = dis
        total = total + dis
    return total, items
