"""3D task-aligned assignment (reference: tal.py:355 ``TaskAlignedAssigner3d``).

Metric: score^alpha * IoU2d^beta * kpSim^gamma, where kpSim compares the 8
camera-frame corner keypoints of predicted vs GT 3D boxes:
kpSim = 1/exp(L1(kps)/24) (tal.py:464-470). The "overlaps" used for both
multi-GT dedup and score normalisation are the keypoint similarities whenever
3D is enabled (tal.py:603 returns similarities). Dense fixed-shape JAX.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou
from ..ops.geometry3d import get_3d_keypoints
from .tal import select_candidates_in_gts, _topk_mask


class Assign3dResult(NamedTuple):
    target_labels: jax.Array        # (B, A)
    target_scores: jax.Array        # (B, A, C)
    target_center_2d: jax.Array     # (B, A, 2)
    target_size_2d: jax.Array       # (B, A, 2)
    target_center_3d: jax.Array     # (B, A, 2)
    target_size_3d: jax.Array       # (B, A, 3)
    target_depth: jax.Array         # (B, A, 1)
    target_heading_bin: jax.Array   # (B, A, 1)
    target_heading_res: jax.Array   # (B, A, 1)
    fg_mask: jax.Array              # (B, A) bool
    target_gt_idx: jax.Array        # (B, A)


def _keypoint_similarity(gt_kps, pd_kps, metric: str = "l1"):
    """(…, 8, 3) pairs -> similarity in (0, 1] (tal.py:464 keypoint_distance_3d)."""
    if metric == "l1":
        dist = jnp.abs(pd_kps - gt_kps).sum((-1, -2)) / 24.0
        return jnp.exp(-dist)
    dist = ((pd_kps - gt_kps) ** 2).sum((-1, -2)) / 24.0
    return jnp.exp(-0.5 * dist)


def assign3d(
    pd_scores: jax.Array,   # (B, A, C) sigmoid scores
    pd_bboxes: jax.Array,   # (B, A, 4) xyxy image pixels (decoded)
    pd_3d: jax.Array,       # (B, A, 31): o3d 2, s3d 3, hd 24, dep 1, dep_un 1
    anc_points: jax.Array,  # (A, 2) image pixels
    gts: Tuple[jax.Array, ...],  # labels (B,M), bbox (B,M,4) xyxy px, c2d, s2d, c3d, s3d, dep, hbin, hres
    mask_gt: jax.Array,     # (B, M)
    stride_tensor: jax.Array,  # (A, 1)
    calibs: jax.Array,      # (B, 6)
    mean_sizes: jax.Array,  # (C, 3)
    *,
    topk: int = 8,
    num_classes: int = 3,
    alpha: float = 0.5,
    beta: float = 1.0,
    gamma: float = 1.0,
    use_2d: bool = True,
    use_3d: bool = True,
    kps_dist_metric: str = "l1",
    constrain_anchors: bool = True,
    eps: float = 1e-9,
):
    (gt_labels, gt_bboxes, gt_c2d, gt_s2d, gt_c3d, gt_s3d, gt_dep, gt_hbin, gt_hres) = gts
    B, A, C = pd_scores.shape
    M = gt_bboxes.shape[1]
    f32 = jnp.float32
    mask_gt = mask_gt.astype(f32)
    gt_labels = jnp.clip(gt_labels.astype(jnp.int32), 0, C - 1)

    pd_o3d, pd_s3d, pd_hd, pd_dep, _ = jnp.split(
        pd_3d.astype(f32), [2, 5, 29, 30], axis=-1
    )

    # decode predicted 3D (tal.py:454-462)
    pd_center_3d = anc_points[None] + pd_o3d * stride_tensor[None]
    pred_cls = pd_scores.argmax(-1)
    pd_size3d = mean_sizes[pred_cls] + pd_s3d
    gt_size3d_abs = mean_sizes[gt_labels] + gt_s3d.astype(f32)

    gt_kps = get_3d_keypoints(
        gt_c3d.astype(f32), gt_dep.astype(f32), gt_size3d_abs, gt_hbin, gt_hres, calibs
    )  # (B, M, 8, 3)
    pd_kps = get_3d_keypoints(
        pd_center_3d, pd_dep, pd_size3d, pd_hd[..., :12], pd_hd[..., 12:], calibs
    )  # (B, A, 8, 3)

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes.astype(f32)).astype(f32)
    mask_valid = (mask_in_gts * mask_gt[..., None]) if constrain_anchors else (
        jnp.broadcast_to(mask_gt[..., None], (B, M, A))
    )
    valid = mask_valid > 0

    # per-GT class score as a one-hot matmul over C (gathers stall the TPU —
    # see the _df_loss note in train/loss.py)
    label_onehot = jax.nn.one_hot(gt_labels, C, dtype=f32)  # (B,M,C)
    bbox_scores = jnp.einsum(
        "bmc,bac->bma", label_onehot, pd_scores.astype(f32),
        precision=jax.lax.Precision.HIGHEST,
    )
    bbox_scores = jnp.where(valid, bbox_scores, 0.0)

    sim = _keypoint_similarity(
        gt_kps[:, :, None], pd_kps[:, None, :], kps_dist_metric
    )  # (B, M, A)
    sim = jnp.where(valid, sim, 0.0)

    if use_2d:
        iou = bbox_iou(
            gt_bboxes.astype(f32)[:, :, None, :], pd_bboxes.astype(f32)[:, None, :, :],
            xywh=False, ciou=True,
        )[..., 0]
        iou = jnp.where(valid, jnp.clip(iou, 0.0, None), 0.0)

    if use_3d and use_2d:
        align_metric = bbox_scores**alpha * iou**beta * sim**gamma
        overlaps = sim
    elif use_3d:
        align_metric = bbox_scores**alpha * sim**gamma
        overlaps = sim
    elif use_2d:
        align_metric = bbox_scores**alpha * iou**beta
        overlaps = iou
    else:
        raise ValueError("either 2D or 3D assignment (or both) must be enabled")

    mask_topk = _topk_mask(align_metric, topk, mask_gt > 0)
    mask_pos = mask_topk * mask_valid

    fg_counts = mask_pos.sum(-2)
    max_overlap_gt = overlaps.argmax(axis=1)
    is_max = jax.nn.one_hot(max_overlap_gt, M, dtype=mask_pos.dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(fg_counts[:, None, :] > 1, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)
    target_gt_idx = mask_pos.argmax(-2).astype(jnp.int32)

    # one-hot matmul gathers over the (small) GT axis — not dynamic gathers
    assign_onehot = jax.nn.one_hot(target_gt_idx, M, dtype=f32)  # (B,A,M)

    def take(x):
        x = x.astype(f32)
        if x.ndim == 2:
            # HIGHEST: the defaults truncate to bf16 on TPU and would
            # round depth/center/size TARGETS the old gather kept exact
            return jnp.einsum(
                "bam,bm->ba", assign_onehot, x,
                precision=jax.lax.Precision.HIGHEST,
            )
        return jnp.einsum(
            "bam,bmf->baf", assign_onehot, x,
            precision=jax.lax.Precision.HIGHEST,
        )

    target_labels = take(gt_labels).astype(jnp.int32)
    target_scores = jnp.einsum(
        "bam,bmc->bac", assign_onehot, label_onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    target_scores = target_scores * (fg_mask[..., None] > 0)

    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(-2)[..., None]
    target_scores = target_scores * norm

    return Assign3dResult(
        target_labels=target_labels,
        target_scores=target_scores,
        target_center_2d=take(gt_c2d.astype(f32)),
        target_size_2d=take(gt_s2d.astype(f32)),
        target_center_3d=take(gt_c3d.astype(f32)),
        target_size_3d=take(gt_s3d.astype(f32)),
        target_depth=take(gt_dep.astype(f32)),
        target_heading_bin=take(gt_hbin.astype(f32)),
        target_heading_res=take(gt_hres.astype(f32)),
        fg_mask=fg_mask > 0,
        target_gt_idx=target_gt_idx,
    )
