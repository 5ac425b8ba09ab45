"""Optimizer / LR-schedule construction (reference: trainer.py:734 ``build_optimizer``,
trainer.py:384-393 warmup, torch_utils.py:390 ``one_cycle``).

The reference builds 3 torch param groups: [0] conv/linear weights (weight
decay), [1] BN weights (no decay), [2] biases (no decay), warms the LR up
per-batch, and steps an epoch LambdaLR. Here it's one optax chain: a masked
add_decayed_weights + a single schedule function closed over warmup state —
all pure, jit-safe, and EMA/accumulation compose as optax transforms.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def one_cycle(y1: float, y2: float, steps: int) -> Callable[[Any], Any]:
    """Cosine ramp y1->y2 over steps (reference torch_utils.py:390)."""

    def fn(x):
        return ((1 - jnp.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1

    return fn


def lr_schedule(
    lr0: float,
    lrf: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_steps: int,
    cos_lr: bool = False,
    warmup_start_frac: float = 0.0,
) -> Callable[[jax.Array], jax.Array]:
    """Per-step LR mirroring the reference's per-epoch LambdaLR + per-batch
    warmup interp (trainer.py:384-393, 636-644).

    warmup_start_frac: 0 for weight groups, warmup_bias_lr/lr0 for biases.
    """
    if cos_lr:
        lf = one_cycle(1.0, lrf, epochs)
    else:
        lf = lambda e: (1 - e / epochs) * (1.0 - lrf) + lrf  # linear

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        base = lr0 * lf(epoch)
        w = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
        warm = warmup_start_frac * lr0 + w * (base - warmup_start_frac * lr0)
        return jnp.where(step < warmup_steps, warm, base)

    return sched


def _wd_mask(params) -> Any:
    """True for kernels that should get weight decay: conv/linear weights, not
    biases, not BN scale (reference trainer.py:766-776 group split)."""
    def mask_leaf(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        leaf_name = names[-1]
        return leaf_name == "kernel"

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def build_optimizer(
    params,
    *,
    name: str = "AdamW",
    lr0: float = 0.001,
    lrf: float = 0.01,
    momentum: float = 0.937,
    weight_decay: float = 0.0005,
    epochs: int = 100,
    steps_per_epoch: int = 100,
    warmup_epochs: float = 3.0,
    cos_lr: bool = False,
    nbs: int = 64,
    batch_size: int = 16,
    grad_clip_norm: float = 10.0,
) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, lr_fn). Matches reference semantics:
    - 'auto' name: AdamW with lr=0.00159 roundlike fit for small epochs is NOT
      replicated; pass an explicit name (the fork default is AdamW, default.yaml:21)
    - weight decay scaled by batch_size * accumulate / nbs (trainer.py:303-306)
    - grad clip 10.0 (trainer.py:567)
    - gradient accumulation to nbs via optax.MultiSteps (trainer.py:307)

    Note (round-3 measurement): wrapping this chain in ``optax.flatten`` (one
    fused update over a single concatenated vector instead of ~300 per-tensor
    kernels) was measured a no-op on TPU — 273.8 vs 275.2 ms/step at B=128 —
    because XLA's static schedule already amortizes small-op dispatch inside
    one compiled step; the whole opt+EMA+state slice is only ~8.6 ms. Kept
    un-flattened for checkpoint-structure stability.
    """
    accumulate = max(round(nbs / batch_size), 1)
    scaled_wd = weight_decay * batch_size * accumulate / nbs
    # reference trainer.py: nw = max(round(warmup_epochs * nb), 100) if
    # warmup_epochs > 0 else -1 — no warmup at all when warmup_epochs <= 0
    # (the 100-step floor otherwise strangles tiny smoke-trains at ~0 lr)
    warmup_steps = (
        max(round(warmup_epochs * steps_per_epoch), 100) if warmup_epochs > 0 else 0
    )
    lr_fn = lr_schedule(lr0, lrf, epochs, steps_per_epoch, warmup_steps, cos_lr)

    if name.lower() in ("adamw", "adam", "auto"):
        base = optax.scale_by_adam(b1=momentum, b2=0.999, eps=1e-8)
    elif name.lower() == "sgd":
        base = optax.trace(decay=momentum, nesterov=True)
    elif name.lower() == "rmsprop":
        base = optax.scale_by_rms()
    else:
        raise ValueError(f"unknown optimizer {name}")

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        base,
        optax.add_decayed_weights(scaled_wd, mask=_wd_mask),
        optax.scale_by_learning_rate(lr_fn),
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, lr_fn


def ema_update(ema_params, new_params, updates: jax.Array, decay: float = 0.9999, tau: float = 2000.0):
    """Model EMA with ramped decay d = decay * (1 - exp(-updates/tau))
    (reference torch_utils.py:416 ``ModelEMA``)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree.map(lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema_params, new_params)
