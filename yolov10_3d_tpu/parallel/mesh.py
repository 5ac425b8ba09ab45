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


def _batch_size_of(batch: Dict[str, Any]) -> int:
    """The batch's leading dim, read off the image/tile leaf — the ONLY
    reliable batch-axis signal. Divisibility heuristics misclassify
    per-epoch vectors whose length happens to divide the mesh (a (12,) HTL
    weight vector on 4 devices — review finding)."""
    for k in ("img", "tiles"):
        v = batch.get(k)
        if getattr(v, "ndim", 0) > 0:
            return int(v.shape[0])
    dims = [x.shape[0] for x in jax.tree.leaves(batch) if getattr(x, "ndim", 0) > 0]
    return max(set(dims), key=dims.count) if dims else 0


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "dp") -> Dict[str, Any]:
    """Place batch-axis arrays with their leading dim sharded over `axis`;
    everything else (per-epoch vectors like HTL weights) replicated."""
    n_axis = int(mesh.shape[axis])  # NOT total devices: (dp, sp) meshes
    sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    B = _batch_size_of(batch)

    def place(x):
        is_batch = (
            getattr(x, "ndim", 0) > 0 and x.shape[0] == B and B % n_axis == 0
        )
        return jax.device_put(x, sh if is_batch else rep)

    return jax.tree.map(place, batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = "dp"):
    """jit the train step with state replicated and batch dp-sharded.

    Gradient reduction over the mesh rides ICI via XLA's sharding propagation
    (psum inserted automatically — scaling-book recipe, not NCCL DDP).
    """
    rep = replicated(mesh)
    # batch shardings are committed per-leaf by shard_batch (dp on the batch
    # axis, replicated for per-epoch vectors like HTL weights) — None here
    # inherits them instead of forcing dp onto every leaf
    return jax.jit(
        train_step,
        in_shardings=(rep, None),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_global_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "dp") -> Dict[str, Any]:
    """Multi-host: per-process LOCAL batch shards -> global sharded arrays.

    Each process feeds its own loader shard (DataLoader(shard_index=...));
    this assembles them into global arrays with the leading axis sharded over
    the full mesh — the multi-host replacement for DistributedSampler
    (reference build.py:111). Arrays whose leading dim isn't a batch axis
    (per-epoch vectors) are replicated.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return shard_batch(batch, mesh, axis)
    n_axis = int(mesh.shape[axis])
    sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    B = _batch_size_of(batch)

    def mk(x):
        x = np.asarray(x)
        is_batch = (
            x.ndim > 0 and x.shape[0] == B and B > 0
            and (B * n_proc) % n_axis == 0
        )
        if is_batch:
            gshape = (x.shape[0] * n_proc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.make_array_from_process_local_data(rep, x, x.shape)

    return jax.tree.map(mk, batch)


def replicate_state_multihost(state, mesh: Mesh):
    """Replicate train state across a multi-process mesh (every process must
    hold identical values, e.g. same-seed init or a host-broadcast ckpt)."""
    if jax.process_count() == 1:
        return replicate_state(state, mesh)
    rep = replicated(mesh)

    def mk(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(rep, x, x.shape)

    return jax.tree.map(mk, state)


def broadcast_flag(value: bool) -> bool:
    """Host-0 -> all-hosts flag broadcast (the reference's stop-flag
    broadcast_object_list, trainer.py:418-421)."""
    from jax.experimental import multihost_utils

    import jax.numpy as jnp

    return bool(multihost_utils.broadcast_one_to_all(jnp.asarray(value)))


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


# ---------------------------------------------------------------- FSDP / ZeRO
def fsdp_sharding(mesh: Mesh, tree, axis: str = "dp"):
    """ZeRO-3/FSDP sharding tree over the SAME axis the batch is sharded on:
    each leaf's largest `axis`-divisible dim is sharded (ties -> last dim, so
    conv kernels shard output channels and stay layout-contiguous); scalars
    and odd-sized leaves replicate.

    Applied to a TrainState this shards params, optimizer moments, and EMA
    alike — per-chip weight+optimizer memory scales 1/|axis| while the math
    stays plain data parallelism: XLA's sharding propagation all-gathers each
    weight at its use site and reduce-scatters the gradients, the scaling-book
    FSDP recipe with zero explicit collectives. The reference's NCCL DDP
    (trainer.py:191-215) always replicates optimizer state; ZeRO is the
    standard fix and falls out of shardings here.
    """
    n = mesh.shape[axis]

    def rule(x):
        ndim = getattr(x, "ndim", 0)
        if ndim >= 1:
            cand = [
                (d, i) for i, d in enumerate(x.shape) if d >= n and d % n == 0
            ]
            if cand:
                _, i = max(cand)  # largest dim; ties -> highest index
                spec = [None] * ndim
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_state_fsdp(state, mesh: Mesh, axis: str = "dp"):
    """Place a TrainState (or any pytree) with FSDP-sharded leaves."""
    sh = fsdp_sharding(mesh, state, axis)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)


def shard_state_fsdp_multihost(state, mesh: Mesh, axis: str = "dp"):
    """FSDP placement across PROCESSES: every process holds the full
    (identical) host values — same-seed init or a broadcast ckpt, exactly
    the replicate_state_multihost contract — and each leaf becomes a global
    array in the fsdp_sharding layout via make_array_from_callback (each
    process serves only its addressable shards, so no host ever materializes
    another host's slice on device)."""
    if jax.process_count() == 1:
        return shard_state_fsdp(state, mesh, axis)
    sh = fsdp_sharding(mesh, state, axis)

    def mk(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(mk, state, sh)


def make_fsdp_train_step(train_step, mesh: Mesh, state, axis: str = "dp"):
    """jit the train step with state FSDP-sharded over `axis` and the batch
    dp-sharded over the same axis (committed per-leaf by shard_batch). The
    updated state keeps the FSDP layout, so the optimizer update itself runs
    sharded (ZeRO-3: no rank ever materializes the full optimizer state)."""
    sh = fsdp_sharding(mesh, state, axis)
    return jax.jit(
        train_step,
        in_shardings=(sh, None),
        out_shardings=(sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


# ------------------------------------------------------------- tensor parallel
def get_mesh_tp(dp: int, tp: int) -> Mesh:
    """2-D (dp, tp) mesh: data parallel x tensor (channel) parallel.

    tp shards every channel-last parameter (conv kernels (kH,kW,I,O) on O, BN
    vectors on C — uniform because the whole net is NHWC/channel-last) and,
    by propagation, every activation's channel axis. XLA inserts the
    all-gathers/reduce-scatters where a conv contracts a sharded input-channel
    axis — the scaling-book tp recipe, expressed purely as shardings. Useful
    when one chip can't hold the model/optimizer state (weight memory scales
    1/tp, FSDP-style) or to shrink per-chip activation footprints for big
    images."""
    devs = jax.devices()[: dp * tp]
    return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))


def channel_sharding(mesh: Mesh, tree, axis: str = "tp"):
    """Sharding tree: last (channel) dim over `axis` when divisible, else
    replicated (scalars, odd-sized leaves like DFL/anchors)."""
    n = mesh.shape[axis]

    def rule(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] % n == 0 and x.shape[-1] > 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_state_channels(state, mesh: Mesh):
    """Place a TrainState (or any pytree) with channel-sharded leaves."""
    sh = channel_sharding(mesh, state)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)


def make_tp_train_step(train_step, mesh: Mesh, state):
    """jit the train step over a (dp, tp) mesh: batch dp-sharded, model +
    optimizer + EMA state channel-sharded over tp (gradients inherit the
    param shardings, so the optimizer update runs sharded too)."""
    sh = channel_sharding(mesh, state)
    return jax.jit(
        train_step,
        in_shardings=(sh, None),
        out_shardings=(sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def make_tp_eval_step(apply_fn, mesh: Mesh, variables):
    """jit an eval forward with channel-sharded weights and dp-sharded batch;
    returns (fn, sharded_variables). Outputs are replicated."""
    sh = channel_sharding(mesh, variables)
    vars_sharded = jax.tree.map(lambda x, s: jax.device_put(x, s), variables, sh)
    fn = jax.jit(
        apply_fn,
        in_shardings=(sh, NamedSharding(mesh, P("dp"))),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn, vars_sharded
