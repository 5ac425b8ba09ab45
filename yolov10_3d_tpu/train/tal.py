"""Task-aligned assignment in pure fixed-shape JAX.

Reference: ultralytics/utils/tal.py:19 ``TaskAlignedAssigner``. The torch
implementation uses boolean masked_select / scatter; here every step is a
dense masked op over (B, M, A) so it jits to one fused XLA computation:
  - top-k candidate selection -> lax.top_k + one-hot counting (the reference's
    scatter_add dedup, tal.py:150-160)
  - multi-GT anchor dedup -> argmax over the GT axis + one-hot select
    (tal.py:241-263 ``select_highest_overlaps``)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jax.Array   # (B, A) int32
    target_bboxes: jax.Array   # (B, A, 4)
    target_scores: jax.Array   # (B, A, C) float
    fg_mask: jax.Array         # (B, A) bool
    target_gt_idx: jax.Array   # (B, A) int32


def select_candidates_in_gts(
    anc_points: jax.Array, gt_bboxes: jax.Array, eps: float = 1e-9
) -> jax.Array:
    """(A,2), (B,M,4 xyxy) -> (B,M,A) bool: anchor centers inside gt boxes
    (reference tal.py:216)."""
    lt = gt_bboxes[..., None, :2]   # (B,M,1,2)
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate(
        [anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1
    )  # (B,M,A,4)
    return deltas.min(-1) > eps


def _topk_mask(metrics: jax.Array, topk: int, valid_gt: jax.Array) -> jax.Array:
    """Reference select_topk_candidates (tal.py:136-160): mark the top-k anchors
    per GT; anchors hit more than once (only possible via the masked-to-0
    fill of invalid GTs) are zeroed.

    TPU note: lax.top_k sorts the whole anchor axis (~15 ms at (64,20,8400) on
    v5e). topk=1 is an argmax; small k uses iterative max-extract (k fused
    max+mask sweeps, ~1 ms) — both avoid the sort.
    """
    A = metrics.shape[-1]
    if topk == 1:
        idx = metrics.argmax(-1)
        counts = jax.nn.one_hot(idx, A, dtype=jnp.int32)
        counts = jnp.where(valid_gt[..., None], counts, 0)
        return counts.astype(metrics.dtype)
    if topk <= 16:
        m = metrics
        mask = jnp.zeros(metrics.shape, bool)
        neg = jnp.finfo(metrics.dtype).min
        for _ in range(topk):
            hit = jax.nn.one_hot(m.argmax(-1), A, dtype=jnp.bool_)
            mask = mask | hit
            m = jnp.where(hit, neg, m)
        counts = mask & valid_gt[..., None]
        # NOTE: ties dedup (counts > 1) can't occur here — each sweep picks a
        # distinct argmax — matching the reference's intent (tal.py:155-159)
        return counts.astype(metrics.dtype)
    _, topk_idx = jax.lax.top_k(metrics, topk)            # (B,M,topk)
    topk_idx = jnp.where(valid_gt[..., None], topk_idx, 0)
    counts = (
        jax.nn.one_hot(topk_idx, metrics.shape[-1], dtype=jnp.int32).sum(-2)
    )  # (B,M,A)
    return jnp.where(counts > 1, 0, counts).astype(metrics.dtype)


def assign(
    pd_scores: jax.Array,   # (B, A, C) sigmoid scores
    pd_bboxes: jax.Array,   # (B, A, 4) xyxy, image units
    anc_points: jax.Array,  # (A, 2) image units
    gt_labels: jax.Array,   # (B, M) int
    gt_bboxes: jax.Array,   # (B, M, 4) xyxy image units
    mask_gt: jax.Array,     # (B, M) bool/float validity
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    B, A, C = pd_scores.shape
    M = gt_bboxes.shape[1]
    if M == 0:
        return AssignResult(
            jnp.full((B, A), num_classes, jnp.int32),
            jnp.zeros((B, A, 4), pd_bboxes.dtype),
            jnp.zeros((B, A, C), pd_scores.dtype),
            jnp.zeros((B, A), bool),
            jnp.zeros((B, A), jnp.int32),
        )
    mask_gt = mask_gt.astype(jnp.float32)
    pd_scores = pd_scores.astype(jnp.float32)
    pd_bboxes = pd_bboxes.astype(jnp.float32)
    gt_bboxes = gt_bboxes.astype(jnp.float32)

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes).astype(jnp.float32)
    mask_valid = mask_in_gts * mask_gt[..., None]  # (B,M,A)

    # scores of each anchor for its GT's class: (B,M,A) as a one-hot matmul
    # over the class axis — MXU-friendly, where a take_along_axis gather on
    # the minor axis stalls the TPU (see _df_loss note in loss.py)
    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, C - 1)
    label_onehot = jax.nn.one_hot(labels, C, dtype=pd_scores.dtype)  # (B,M,C)
    bbox_scores = jnp.einsum(
        "bmc,bac->bma", label_onehot, pd_scores,
        precision=jax.lax.Precision.HIGHEST,
    )
    bbox_scores = jnp.where(mask_valid > 0, bbox_scores, 0.0)

    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, ciou=True
    )[..., 0]
    overlaps = jnp.where(mask_valid > 0, jnp.clip(overlaps, 0.0, None), 0.0)

    align_metric = bbox_scores**alpha * overlaps**beta

    mask_topk = _topk_mask(align_metric, topk, mask_gt > 0)
    mask_pos = mask_topk * mask_in_gts * mask_gt[..., None]

    # resolve anchors claimed by multiple GTs: keep highest-overlap GT
    fg_counts = mask_pos.sum(-2)                       # (B,A)
    max_overlap_gt = overlaps.argmax(axis=1)           # (B,A)
    is_max = jax.nn.one_hot(max_overlap_gt, M, dtype=mask_pos.dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(fg_counts[:, None, :] > 1, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)                         # (B,A)
    target_gt_idx = mask_pos.argmax(-2).astype(jnp.int32)  # (B,A)

    # gather targets via the assignment one-hot (mask_pos IS one_hot(target_gt_idx)
    # on fg anchors) — matmul instead of dynamic gather
    assign_onehot = jax.nn.one_hot(target_gt_idx, M, dtype=jnp.float32)  # (B,A,M)
    # HIGHEST precision: TPU default truncates einsum operands to bf16,
    # which would round the gathered pixel-coordinate / one-hot TARGETS the
    # old take_along_axis produced exactly (silent parity drift on TPU only)
    hi = jax.lax.Precision.HIGHEST
    target_labels = jnp.einsum(
        "bam,bm->ba", assign_onehot, labels.astype(jnp.float32), precision=hi
    ).astype(jnp.int32)
    target_bboxes = jnp.einsum("bam,bmf->baf", assign_onehot, gt_bboxes, precision=hi)
    target_scores = jnp.einsum("bam,bmc->bac", assign_onehot, label_onehot, precision=hi)
    target_scores = target_scores * (fg_mask[..., None] > 0)

    # normalise scores by per-GT max metric (reference tal.py:88-93)
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)                 # (B,M,1)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)      # (B,M,1)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(-2)[..., None]  # (B,A,1)
    target_scores = target_scores * norm

    return AssignResult(
        target_labels, target_bboxes, target_scores, fg_mask > 0, target_gt_idx
    )
