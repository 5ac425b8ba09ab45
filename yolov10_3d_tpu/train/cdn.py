"""Contrastive denoising (CDN) query groups for RT-DETR training
(reference: models/utils/ops.py:153 get_cdn_group).

TPU-first redesign with fully static shapes: ground truth arrives padded to
(B, M) with a validity mask (instead of the reference's ragged per-image
lists), and the denoising layout is the same slot grid the reference
scatters into — slot ``i*M + j`` of the (B, 2*G*M) group tensor holds noisy
repeat ``i`` of gt ``j``. Blocks 0..G-1 are positives, blocks G..2G-1 are
negatives (shifted 1-2 box widths). The self-attention mask is a
compile-time constant.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import xywh2xyxy, xyxy2xywh


@lru_cache(maxsize=None)
def cdn_attn_mask(max_nums: int, num_group: int, num_queries: int) -> np.ndarray:
    """(D + nq, D + nq) bool mask, True = blocked (reference ops.py:239-251:
    matching queries cannot see denoising queries; denoising pair-blocks
    cannot see each other)."""
    num_dn = max_nums * 2 * num_group
    t = num_dn + num_queries
    m = np.zeros((t, t), bool)
    m[num_dn:, :num_dn] = True
    for i in range(num_group):
        lo, hi = max_nums * 2 * i, max_nums * 2 * (i + 1)
        m[lo:hi, hi:num_dn] = True
        m[lo:hi, :lo] = True
    return m


def get_cdn_group(
    gt_cls: jax.Array,  # (B, M) int
    gt_bboxes: jax.Array,  # (B, M, 4) xywh normalized
    gt_mask: jax.Array,  # (B, M) validity
    num_classes: int,
    num_queries: int,
    class_embed: jax.Array,  # (nc, hd)
    rng: jax.Array,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
    _noise=None,  # test hook: dict(flip, new_label, sign, part) overrides rng
) -> Tuple[jax.Array, jax.Array, jax.Array, Dict]:
    """Returns (dn_embed (B, D, hd), dn_bbox (B, D, 4) logits, attn_mask
    (D+nq, D+nq) bool, meta). D = 2 * num_group * M with
    num_group = max(num_dn // M, 1); invalid slots are zeroed (they are
    additionally excluded from attention by their zero embedding and from
    the loss by the tiled validity mask in meta)."""
    B, M = gt_cls.shape
    G = max(num_dn // M, 1)
    D = 2 * G * M

    k_cls, k_new, k_sign, k_part = jax.random.split(rng, 4)

    dn_cls = jnp.tile(gt_cls, (1, 2 * G))  # (B, D)
    dn_box = jnp.tile(gt_bboxes, (1, 2 * G, 1)).astype(jnp.float32)  # (B, D, 4)
    dn_valid = jnp.tile(gt_mask.astype(bool), (1, 2 * G))  # (B, D)
    # negative blocks: slots >= G*M (reference neg_idx, ops.py:202)
    is_neg = (jnp.arange(D) >= G * M)[None, :]  # (1, D)

    if cls_noise_ratio > 0:
        flip = (
            _noise["flip"] if _noise
            else jax.random.uniform(k_cls, (B, D)) < (cls_noise_ratio * 0.5)
        )
        new_label = (
            _noise["new_label"] if _noise
            else jax.random.randint(k_new, (B, D), 0, num_classes, dn_cls.dtype)
        )
        dn_cls = jnp.where(flip, new_label, dn_cls)

    if box_noise_scale > 0:
        known = xywh2xyxy(dn_box)
        diff = jnp.tile(dn_box[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        sign = (
            _noise["sign"] if _noise
            else jax.random.randint(k_sign, (B, D, 4), 0, 2).astype(jnp.float32) * 2.0 - 1.0
        )
        part = _noise["part"] if _noise else jax.random.uniform(k_part, (B, D, 4))
        part = part + is_neg[..., None].astype(jnp.float32)  # negatives: 1-2 widths
        known = jnp.clip(known + part * sign * diff, 0.0, 1.0)
        dn_box = xyxy2xywh(known)
    p = jnp.clip(dn_box, 1e-6, 1 - 1e-6)
    dn_bbox = jnp.log(p / (1 - p))  # torch.logit(eps=1e-6)

    dn_embed = class_embed[dn_cls]  # (B, D, hd)
    dn_embed = jnp.where(dn_valid[..., None], dn_embed, 0.0)
    dn_bbox = jnp.where(dn_valid[..., None], dn_bbox, 0.0)

    mask = jnp.asarray(cdn_attn_mask(M, G, num_queries))
    meta = {"dn_num_group": G, "dn_num_split": (D, num_queries), "dn_valid": dn_valid}
    return dn_embed, dn_bbox, mask, meta
