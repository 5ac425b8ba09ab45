"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP machinery (trainer.py:191-215
subprocess relaunch, utils/dist.py launcher, NCCL process groups): a 1-D
``dp`` mesh over ICI, batches sharded on the leading axis, model/optimizer
state replicated; XLA inserts the gradient all-reduce from sharding
propagation — no explicit collectives, no process relaunch.

For multi-host: call ``jax.distributed.initialize()`` before ``get_mesh`` and
feed each host its local batch shard (make_per_host_batch).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "dp") -> Dict[str, Any]:
    """Place every array in the batch with its leading dim sharded over dp."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "dp"):
    """jit the train step with state replicated and batch dp-sharded.

    Gradient reduction over the mesh rides ICI via XLA's sharding propagation
    (psum inserted automatically — scaling-book recipe, not NCCL DDP).
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def get_mesh_2d(dp: int, sp: int) -> Mesh:
    """2-D (dp, sp) mesh: data parallel x spatial parallel. The sp axis
    shards image HEIGHT; XLA inserts the conv halo exchanges over ICI
    automatically from sharding propagation — useful for huge images or
    small per-chip batches where dp alone underfills the chips."""
    devs = jax.devices()[: dp * sp]
    return Mesh(np.array(devs).reshape(dp, sp), ("dp", "sp"))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over dp, height over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def make_spatial_eval_step(apply_fn, mesh: Mesh):
    """jit an eval forward with images sharded (dp, sp) and state
    replicated; outputs replicated."""
    rep = NamedSharding(mesh, P())
    return jax.jit(
        apply_fn,
        in_shardings=(rep, spatial_batch_sharding(mesh)),
        out_shardings=rep,
    )
