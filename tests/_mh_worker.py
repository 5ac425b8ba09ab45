"""Multi-host worker: one of two jax.distributed CPU processes running the
full sharded train loop — per-host loader shards, global batch assembly,
psum-by-sharding gradients, host-0-only checkpoint, stop-flag broadcast.
Launched by tests/test_multihost.py."""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
)

import numpy as np
import jax.numpy as jnp
import optax

from yolov10_3d_tpu.data.dataset import DataLoader
from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.parallel.mesh import (
    broadcast_flag, get_mesh, make_global_batch, make_parallel_train_step,
    replicate_state_multihost,
)
from yolov10_3d_tpu.train.state import TrainState, make_train_step

assert jax.process_count() == 2 and jax.device_count() == 4


class DS:
    """Deterministic synthetic detection samples (seeded by index)."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "img": rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
            "gt_labels": np.zeros(5, np.int32),
            "gt_bboxes": np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32), (5, 1)),
            "mask_gt": np.ones(5, bool),
            "im_id": np.asarray(i, np.int64),
        }


# tiny 5-conv model: the test exercises the DISTRIBUTED machinery, not the
# architecture — keeps 2-process compile time bounded on a loaded box
def _write_atomic(path, text):
    """tmp + rename: proc 1 polls os.path.exists and must never see a
    partially-written yaml (review fix)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.rename(tmp, path)


mini_yaml = os.path.join(outdir, "mini.yaml")
if proc_id == 0 and not os.path.exists(mini_yaml):
    _write_atomic(
        mini_yaml,
            "nc: 2\n"
            "scales: {n: [1.0, 1.0, 256]}\n"
            "backbone:\n"
            "  - [-1, 1, Conv, [8, 3, 2]]\n"
            "  - [-1, 1, Conv, [16, 3, 2]]\n"
            "  - [-1, 1, Conv, [16, 3, 2]]\n"
            "  - [-1, 1, Conv, [32, 3, 2]]\n"
            "  - [-1, 1, Conv, [32, 3, 2]]\n"
            "head:\n"
            "  - [[2, 3, 4], 1, v10Detect, [nc]]\n"
    )
else:
    import time as _t

    for _ in range(100):
        if os.path.exists(mini_yaml):
            break
        _t.sleep(0.1)
model, spec = build_model(mini_yaml)
variables = jax.jit(model.init, static_argnames="train")(
    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
)
tx = optax.sgd(0.01, momentum=0.9)
step = make_train_step(model, tx, nc=spec.nc, strides=spec.strides)
state = TrainState.create(variables, tx)

mesh = get_mesh()  # all 4 global devices
pstep = make_parallel_train_step(step, mesh)
state = replicate_state_multihost(state, mesh)

# per-host loader shard: same shuffle seed -> disjoint halves of the dataset
loader = DataLoader(
    DS(), batch_size=4, shuffle=True, seed=0, shard_index=proc_id, num_shards=2,
    num_threads=2,
)
# AOT-compile the sharded step BEFORE the first collective executes, then
# rendezvous: Gloo's context init has a hard ~30s KV timeout, and on a loaded
# box one process's cold compile can lag past it (the AOT cache does not load
# here — machine-feature mismatch). Compiling first + a coordination-service
# barrier (generous timeout) makes both processes hit the psum together.
warm = {
    "img": np.zeros((4, 64, 64, 3), np.float32),
    "gt_labels": np.zeros((4, 5), np.int32),
    "gt_bboxes": np.zeros((4, 5, 4), np.float32),
    "mask_gt": np.ones((4, 5), bool),
    "im_id": np.zeros((4,), np.int64),
}
gb0 = make_global_batch(warm, mesh)
pstep.lower(state, gb0).compile()
from jax._src import distributed as _dist

_dist.global_state.client.wait_at_barrier("mh_precompiled", 600_000)

seen = []
losses = []
for epoch in range(2):
    for b in loader:
        seen.extend(np.asarray(b["im_id"]).tolist())
        gb = make_global_batch(b, mesh)
        state, m = pstep(state, gb)
        losses.append(float(m["loss"]))

# -- FSDP multi-host leg (round-5): ZeRO-3 state sharded over the dp axis
# ACROSS HOSTS (params + moments + EMA live split between the two processes;
# XLA all-gathers weights at use and reduce-scatters grads over the
# cross-host axis). One step from a fresh state must equal the replicated-dp
# step's numerics, and the updated state keeps the FSDP layout for step 2.
from yolov10_3d_tpu.parallel.mesh import (
    make_fsdp_train_step, shard_state_fsdp_multihost,
)

items = [DS()[i] for i in range(proc_id * 4, proc_id * 4 + 4)]
local_f = {k: np.stack([it[k] for it in items]) for k in items[0]}
gb_f = make_global_batch(local_f, mesh)

state_d = replicate_state_multihost(TrainState.create(variables, tx), mesh)
_, m_dp = pstep(state_d, gb_f)  # replicated-dp reference step (same jaxpr)
state_f = shard_state_fsdp_multihost(TrainState.create(variables, tx), mesh)
# leaves of the optimizer/param tree really live sharded across the hosts
n_sharded = sum(
    1
    for leaf in jax.tree.leaves(state_f)
    if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
)
pstep_f = make_fsdp_train_step(step, mesh, state_f)
pstep_f.lower(state_f, gb_f).compile()
_dist.global_state.client.wait_at_barrier("mh_fsdp_precompiled", 600_000)
state_f, m_f = pstep_f(state_f, gb_f)
state_f, m_f2 = pstep_f(state_f, gb_f)  # layout-preserving second step
print(
    f"MHFSDP proc={proc_id} loss_dp={float(m_dp['loss']):.6f} "
    f"loss_fsdp={float(m_f['loss']):.6f} loss_fsdp2={float(m_f2['loss']):.6f} "
    f"n_sharded={n_sharded}",
    flush=True,
)

# -- 3D leg (round-3): the 17-column KITTI batch (calib, 3D targets,
# mean_sizes) crosses make_global_batch and the sharded dual-branch 3D loss
# runs one step; both hosts must agree on the loss
mini3d_yaml = os.path.join(outdir, "mini3d.yaml")
if proc_id == 0 and not os.path.exists(mini3d_yaml):
    _write_atomic(
        mini3d_yaml,
            "nc: 2\n"
            "scales: {n: [1.0, 1.0, 256]}\n"
            "backbone:\n"
            "  - [-1, 1, Conv, [8, 3, 2]]\n"
            "  - [-1, 1, Conv, [16, 3, 2]]\n"
            "  - [-1, 1, Conv, [16, 3, 2]]\n"
            "  - [-1, 1, Conv, [32, 3, 2]]\n"
            "  - [-1, 1, Conv, [32, 3, 2]]\n"
            "head:\n"
            "  - [[2, 3, 4], 1, v10Detect3d, [nc]]\n"
    )
else:
    import time as _t

    for _ in range(100):
        if os.path.exists(mini3d_yaml):
            break
        _t.sleep(0.1)

import __graft_entry__ as graft
from yolov10_3d_tpu.train.loss3d import detect3d_loss

model3, spec3 = build_model(mini3d_yaml)
vars3 = jax.jit(model3.init, static_argnames="train")(
    jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), train=False
)
tx3 = optax.sgd(0.01, momentum=0.9)
step3 = make_train_step(
    model3, tx3, nc=spec3.nc, strides=spec3.strides,
    loss_fn=lambda preds, b: detect3d_loss(
        preds, b, nc=spec3.nc, strides=spec3.strides, hyp=graft.HYP_3D
    ),
)
state3 = replicate_state_multihost(TrainState.create(vars3, tx3), mesh)
pstep3 = make_parallel_train_step(step3, mesh)
local3 = {
    k: np.asarray(v)
    for k, v in graft.make_3d_batch(4, (32, 64), nc=spec3.nc, seed=proc_id).items()
}
gb3 = make_global_batch(local3, mesh)
pstep3.lower(state3, gb3).compile()
_dist.global_state.client.wait_at_barrier("mh3d_precompiled", 600_000)
state3, m3 = pstep3(state3, gb3)
loss3d = float(m3["loss"])
print(f"MH3D proc={proc_id} loss3d={loss3d:.6f}", flush=True)

# host-0-only checkpoint write (reference rank-0 save, trainer.py:454)
if jax.process_index() == 0:
    from yolov10_3d_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(
        os.path.join(outdir, "mh.ckpt"),
        params=jax.device_get(state.params),
        meta={"procs": 2},
    )

# stop-flag broadcast from host 0 (reference trainer.py:418-421)
stop = broadcast_flag(proc_id == 0)
assert stop is True

print(f"MHRESULT proc={proc_id} losses={losses} seen={sorted(seen)}", flush=True)

# explicit cross-process sync before interpreter exit: under a loaded box one
# worker can lag (cold compiles) and miss jax.distributed's implicit shutdown
# barrier window, failing the run spuriously
from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("mh_worker_done")
jax.distributed.shutdown()
