"""Train state + jitted train step.

Replaces the reference's mutable BaseTrainer inner loop (trainer.py:378-433):
one pure ``train_step(state, batch) -> (state, metrics)`` compiled once,
containing forward (mutable BN stats), dual-assignment loss, grad, clip,
optimizer update, and EMA — the epoch driver is a thin host loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .loss import v10_detect_loss
from .optim import ema_update


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            # materialise a copy: ema must not alias params (buffer donation)
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
        )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    nc: int,
    strides: Tuple[int, ...],
    gains: Tuple[float, float, float] = (7.5, 0.5, 1.5),
    one2many_topk: int = 10,
    compute_dtype: jnp.dtype = jnp.float32,
    loss_fn: Optional[Callable] = None,
    head_kwargs_fn: Optional[Callable] = None,
    preprocess_fn: Optional[Callable] = None,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jittable train step. ``loss_fn(preds, batch)`` may override the
    default v10 dual loss (used by the 3D trainer). ``head_kwargs_fn(batch,
    step)`` supplies extra head inputs (RT-DETR contrastive denoising).
    ``preprocess_fn(batch, step) -> batch`` runs INSIDE the jitted step —
    the device-augmentation hook (ops/device_aug.py): host tiles in, fully
    augmented img + labels out, fused with forward/backward."""

    def _loss(preds, batch):
        if loss_fn is not None:
            return loss_fn(preds, batch)
        return v10_detect_loss(
            preds, batch, nc=nc, strides=strides, gains=gains, one2many_topk=one2many_topk
        )

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        # the device-aug preprocess consumes tile batches; after close_mosaic
        # the loader switches back to plain img batches (trace-time branch —
        # jit retraces once on the new batch structure)
        if preprocess_fn is not None and "tiles" in batch:
            batch = preprocess_fn(batch, state.step)
        img = batch["img"]
        if img.dtype == jnp.uint8:  # uint8 H2D path: normalize on device
            img = img.astype(compute_dtype) / 255.0
        else:
            img = img.astype(compute_dtype)

        def forward(params):
            extra = (
                {"head_kwargs": head_kwargs_fn(batch, state.step)}
                if head_kwargs_fn is not None
                else {}
            )
            preds, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
                **extra,
            )
            total, aux = _loss(preds, batch)
            return total.astype(jnp.float32), (aux, mut["batch_stats"])

        (loss, (aux, new_bs)), grads = jax.value_and_grad(forward, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(state.ema_params, new_params, state.step + 1)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            ema_params=new_ema,
            opt_state=new_opt,
        )
        metrics = {"loss": loss, **{k: v for k, v in dict(aux).items()}}
        return new_state, metrics

    return train_step


def eval_variables(state: TrainState, use_ema: bool = True) -> Dict[str, Any]:
    """Variables dict for validation (EMA weights, like trainer.py:445 eval)."""
    return {
        "params": state.ema_params if use_ema else state.params,
        "batch_stats": state.batch_stats,
    }
