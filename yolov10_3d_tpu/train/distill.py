"""Feature distillation from a frozen depth teacher (reference: loss.py:1138
``SupervisionLoss`` — DINOv2 depth-head embeddings at GT 3D centers, soft-KL /
mse / cosine criteria).

The teacher is a pluggable callable ``teacher(imgs) -> (depth_maps,
embeddings)`` (the reference hardwires a torch-hub DINOv2 + mmcv head gated on
DINO_PATH; offline environments supply their own, e.g. a converted-jax teacher
or None to disable). All math below is pure jnp and teacher-agnostic.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _masked_criterion(pred, teacher, mask_f, n, kind: str, T: float):
    """Shared soft-KL / mse / cos over (..., C) embeddings with a float
    validity mask (..., 1) and normalizer n (reference loss.py:1177-1186).
    The ONE implementation both supervision losses use (they used to carry
    drifting inline copies — review finding)."""
    C = pred.shape[-1]
    if kind == "soft":
        soft_t = jax.nn.softmax(teacher / T, axis=-1)
        log_p = jax.nn.log_softmax(pred / T, axis=-1)
        return ((soft_t * (jnp.log(soft_t + 1e-12) - log_p)) * mask_f).sum() / n * (T**2)
    if kind == "mse":
        return (((pred - teacher) ** 2) * mask_f).sum() / jnp.maximum(mask_f.sum() * C, 1)
    if kind == "cos":
        pn = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-12)
        tn = teacher / (jnp.linalg.norm(teacher, axis=-1, keepdims=True) + 1e-12)
        return ((1.0 - (pn * tn).sum(-1)) * mask_f[..., 0]).sum() / n
    raise ValueError(f"unknown distillation criterion {kind!r} (soft|mse|cos)")


def supervision_head_loss(
    teacher_embeddings: jax.Array,  # (B, Ht, Wt, Ct) frozen teacher features
    pred_embeddings: jax.Array,     # (B, A, C) depth-head embeddings (flattened scales)
    gt_center_3d: jax.Array,        # (B, M, 2) projected centers, input pixels
    target_gt_idx: jax.Array,       # (B, A) assigner output
    fg_mask: jax.Array,             # (B, A) bool
    mask_gt: jax.Array,             # (B, M) bool
    mixed_mask: jax.Array,          # (B,) bool (mixup'd images skipped)
    img_hw: Tuple[int, int],
    *,
    criterion: str = "soft",
    T: float = 2.0,
    weight: float = 0.75,
    no_mixup: bool = True,
) -> jax.Array:
    """Distill depth-head embeddings toward teacher features sampled at the
    assigned GT 3D centers (loss.py:1157-1189 ``forward_head``), fixed-shape
    masked variant."""
    B, A, C = pred_embeddings.shape
    Ht, Wt = teacher_embeddings.shape[1:3]
    h, w = img_hw
    # teacher feature at each GT center
    cx = jnp.clip(jnp.round(gt_center_3d[..., 0] / w * Wt), 0, Wt - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.round(gt_center_3d[..., 1] / h * Ht), 0, Ht - 1).astype(jnp.int32)
    t_at_gt = teacher_embeddings[jnp.arange(B)[:, None], cy, cx]  # (B, M, Ct)
    # broadcast to anchors via the assignment
    t_per_anchor = jnp.take_along_axis(t_at_gt, target_gt_idx[..., None], axis=1)

    valid = fg_mask & jnp.take_along_axis(mask_gt, target_gt_idx, axis=1)
    if no_mixup:
        valid = valid & ~mixed_mask[:, None]
    vf = valid.astype(jnp.float32)[..., None]
    n = jnp.maximum(valid.sum(), 1)

    loss = _masked_criterion(pred_embeddings, t_per_anchor, vf, n, criterion, T)
    return loss * weight


def supervision_fgdm_loss(
    teacher_embeddings: jax.Array,  # (B, Ht, Wt, Ct)
    fgdm_embeddings: jax.Array,     # (B, Hf, Wf, C)
    gt_depth_maps: jax.Array,       # (B, Hd, Wd)
    *,
    criterion: str = "soft",
    T: float = 2.0,
    weight: float = 1.0,
) -> jax.Array:
    """Distill the fgdm embeddings toward the teacher on foreground pixels
    (loss.py:1191-1211 ``forward_fgdm``)."""
    B, Hf, Wf, C = fgdm_embeddings.shape
    t = jax.image.resize(teacher_embeddings, (B, Hf, Wf, teacher_embeddings.shape[-1]), "bilinear")
    d = jax.image.resize(gt_depth_maps[..., None], (B, Hf, Wf, 1), "bilinear")[..., 0]
    mask = (d > 0).astype(jnp.float32)[..., None]
    n = jnp.maximum((d > 0).sum(), 1)
    loss = _masked_criterion(fgdm_embeddings, t, mask, n, criterion, T)
    return loss * weight
