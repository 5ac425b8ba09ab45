"""Shared test helpers: cached model builds with jitted init."""

import functools

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.build import build_model

CFG_DIR = "yolov10_3d_tpu/cfg/models/v10"


@functools.lru_cache(maxsize=None)
def _jitted_apply(model):
    return jax.jit(
        lambda v, x: model.apply(v, x, train=False), static_argnames=()
    )


def apply_model(model, variables, x):
    """Jitted eval-mode forward (eager flax apply is pathologically slow on CPU)."""
    return _jitted_apply(model)(variables, x)


@functools.lru_cache(maxsize=None)
def build_jax(scale: str, h: int = 64, w: int = 64):
    """Build flax model + init variables (jitted init, cached per scale)."""
    path = (
        f"{CFG_DIR}/yolov10{scale}.yaml"
        if "3D" not in scale
        else f"yolov10_3d_tpu/cfg/models/v10-3D/yolov10{scale}.yaml"
    )
    model, spec = build_model(path)
    x = jnp.zeros((1, h, w, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    return model, spec, variables
