"""Foreground depth-map loss (reference: loss.py:1225 ``ForegroundDepthMapLoss``
+ :1330 ``Balancer`` + LogitFocalLoss) — focal classification over 80 LID
depth bins with fg/bg pixel balancing. Pure jnp, fixed shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def bin_depths(
    depth_map: jax.Array,
    depth_min: float,
    depth_max: float,
    num_bins: int = 80,
    mode: str = "LID",
) -> jax.Array:
    """Depth map -> integer bin indices; out-of-range/invalid -> num_bins
    (reference loss.py:1260 ``bin_depths`` with target=True)."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(1 + 8 * (depth_map - depth_min) / bin_size)
    elif mode == "SID":
        indices = (
            num_bins
            * (jnp.log(1 + depth_map) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    else:
        raise NotImplementedError(mode)
    invalid = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
    return jnp.where(invalid, num_bins, indices).astype(jnp.int32)


def focal_ce(logits: jax.Array, targets: jax.Array, alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Multi-class focal loss on logits (kornia-style LogitFocalLoss,
    reference loss.py:1442-1564). logits (..., C), targets (...) int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    onehot = jax.nn.one_hot(tgt, logits.shape[-1], dtype=logp.dtype)
    logp_t = (logp * onehot).sum(-1)  # one-hot contraction, not a gather
    p_t = jnp.exp(logp_t)
    return -alpha * (1 - p_t) ** gamma * logp_t


def foreground_depth_map_loss(
    depth_logits: jax.Array,  # (B, H, W, D+1) from DepthPredictor
    depth_maps: jax.Array,    # (B, Hd, Wd) per-pixel fg depth (0 = background)
    *,
    depth_min: float = 1.0,
    depth_max: float = 120.0,
    num_bins: int = 80,
    alpha: float = 0.25,
    gamma: float = 2.0,
    fg_weight: float = 13.0,
    bg_weight: float = 1.0,
) -> jax.Array:
    """Focal loss over LID bins + fg/bg balancing (reference loss.py:1300-1365)."""
    B, H, W, _ = depth_logits.shape
    # nearest-downsample the GT depth map to the logits grid
    Hd, Wd = depth_maps.shape[1], depth_maps.shape[2]
    ys = (jnp.arange(H) * (Hd / H)).astype(jnp.int32)
    xs = (jnp.arange(W) * (Wd / W)).astype(jnp.int32)
    dm = depth_maps[:, ys][:, :, xs]  # (B, H, W)

    target = bin_depths(dm, depth_min, depth_max, num_bins)
    loss = focal_ce(depth_logits, target, alpha, gamma)  # (B, H, W)

    fg = dm > 0
    weights = jnp.where(fg, fg_weight, bg_weight)
    num_pixels = fg.size
    return (loss * weights).sum() / num_pixels
