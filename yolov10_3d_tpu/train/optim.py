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


def _leaf_name_mask(params, match: str, invert: bool = False) -> Any:
    def mask_leaf(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        hit = names[-1] == match
        return (not hit) if invert else hit

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def _wd_mask(params) -> Any:
    """True for kernels that should get weight decay: conv/linear weights, not
    biases, not BN scale (reference trainer.py:766-776 group split)."""
    return _leaf_name_mask(params, "kernel")


def _bias_mask(params) -> Any:
    """True for bias leaves — the reference's param group [0], which warms up
    from warmup_bias_lr instead of 0 (trainer.py:384-393)."""
    return _leaf_name_mask(params, "bias")


def resolve_auto_optimizer(
    nc: int, n_samples: int, batch: int, nbs: int, epochs: int
) -> Tuple[str, float, float, float]:
    """The reference's ``optimizer=auto`` rule (trainer.py:757-764): SGD for
    long runs (>10k iterations), AdamW with an nc-fitted lr for short ones;
    bias warmup forced to 0 either way (Adam can't take the 0.1 spike).
    Returns (name, lr0, momentum, warmup_bias_lr)."""
    import math

    iterations = math.ceil(n_samples / max(batch, nbs)) * epochs
    if iterations > 10000:
        return "SGD", 0.01, 0.9, 0.0
    return "AdamW", round(0.002 * 5 / (4 + nc), 6), 0.9, 0.0


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
    warmup_bias_lr: float = 0.1,
    warmup_momentum: float = 0.8,
) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, lr_fn). Matches reference semantics:
    - 'auto' name: AdamW with lr=0.00159 roundlike fit for small epochs is NOT
      replicated; pass an explicit name (the fork default is AdamW, default.yaml:21)
    - weight decay scaled by batch_size * accumulate / nbs (trainer.py:303-306)
    - AdamW decay is decoupled, SGD/RMSprop decay is coupled into the momentum
      buffer — exactly torch.optim's orders (round-4 prescribed-grad lockstep)
    - grad clip 10.0 (trainer.py:567)
    - gradient accumulation to nbs via optax.MultiSteps (trainer.py:307)
    - per-group warmup (trainer.py:384-393): biases warm from warmup_bias_lr
      down/up to the schedule, everything else from 0; SGD momentum warms from
      warmup_momentum to momentum. (The reference also ramps `accumulate`
      during warmup; kept constant here — it only reweights the first nw
      virtual batches of a multi-step accumulation run.)

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

    wd = optax.add_decayed_weights(scaled_wd, mask=_wd_mask)
    is_sgd_like = name.lower() in ("sgd", "rmsprop")
    nesterov = name.lower() == "sgd"  # torch RMSprop's buffer is plain momentum
    if warmup_steps > 0 and is_sgd_like:
        # momentum warms from warmup_momentum -> momentum over the warmup
        # window (trainer.py:391-393 interps group["momentum"] per batch for
        # EVERY group that has one — SGD and RMSprop alike)
        def momentum_fn(count):
            w = jnp.clip(count / max(warmup_steps, 1), 0.0, 1.0)
            return warmup_momentum + w * (momentum - warmup_momentum)

        trace = optax.inject_hyperparams(
            optax.trace, static_args=("nesterov",)
        )(decay=momentum_fn, nesterov=nesterov)
    else:
        trace = optax.trace(decay=momentum, nesterov=nesterov)

    if name.lower() in ("adamw", "adam", "auto"):
        # decoupled decay (torch AdamW): wd applied AFTER the adam scaling
        pieces = [optax.scale_by_adam(b1=momentum, b2=0.999, eps=1e-8), wd]
    elif name.lower() == "sgd":
        # coupled decay (torch SGD): g += wd*p BEFORE the momentum buffer,
        # so the decay term accumulates into the velocity exactly as the
        # reference's torch.optim.SGD does (round-4 lockstep parity)
        pieces = [wd, trace]
    elif name.lower() == "rmsprop":
        # torch RMSprop(momentum=m) as the reference builds it
        # (trainer.py:779): coupled wd, nu decay alpha=0.99 (NOT optax's 0.9
        # default), eps OUTSIDE the sqrt, then a momentum buffer on the
        # rms-scaled step
        pieces = [
            wd,
            optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False),
            trace,
        ]
    else:
        raise ValueError(f"unknown optimizer {name}")

    if warmup_steps > 0 and warmup_bias_lr:
        # biases warm from warmup_bias_lr, everything else from 0
        # (trainer.py:388: j == 0 is the bias group)
        lr_bias = lr_schedule(
            lr0, lrf, epochs, steps_per_epoch, warmup_steps, cos_lr,
            warmup_start_frac=warmup_bias_lr / lr0,
        )
        lr_pieces = [
            optax.masked(
                optax.scale_by_learning_rate(lr_fn),
                lambda p: _leaf_name_mask(p, "bias", invert=True),
            ),
            optax.masked(
                optax.scale_by_learning_rate(lr_bias),
                lambda p: _leaf_name_mask(p, "bias"),
            ),
        ]
    else:
        lr_pieces = [optax.scale_by_learning_rate(lr_fn)]

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        *pieces,
        *lr_pieces,
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, lr_fn


def ema_update(ema_params, new_params, updates: jax.Array, decay: float = 0.9999, tau: float = 2000.0):
    """Model EMA with ramped decay d = decay * (1 - exp(-updates/tau))
    (reference torch_utils.py:416 ``ModelEMA``)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree.map(lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema_params, new_params)
