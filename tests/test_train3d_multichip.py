"""3D train step over the device mesh (VERDICT r2 item #3): the full
17-column KITTI batch (calib matrices, 3D targets, mean_sizes) crosses
shard_batch and the dp8 step reproduces single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.parallel.mesh import (
    get_mesh, make_parallel_train_step, replicate_state, shard_batch,
)
from yolov10_3d_tpu.train.loss3d import detect3d_loss
from yolov10_3d_tpu.train.optim import build_optimizer
from yolov10_3d_tpu.train.state import TrainState, make_train_step

import __graft_entry__ as graft


def _setup(B=8):
    from yolov10_3d_tpu.nn.build import build_model

    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml", nc=3
    )
    x = jnp.zeros((1, 96, 320, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    # SGD: with warmup_epochs=0 the first step runs at full LR, and AdamW's
    # normalized update amplifies psum-reduction-order sign flips of
    # near-zero grads into +-lr param jumps (see test_train_step.py dp8 note)
    tx, _ = build_optimizer(
        variables["params"], name="SGD", epochs=1, steps_per_epoch=10,
        batch_size=B, nbs=B, warmup_epochs=0.0,
    )

    def loss_fn(preds, batch):
        return detect3d_loss(
            preds, batch, nc=spec.nc, strides=spec.strides, hyp=graft.HYP_3D
        )

    step = make_train_step(model, tx, nc=spec.nc, strides=spec.strides, loss_fn=loss_fn)
    state = TrainState.create(variables, tx)
    batch = graft.make_3d_batch(B, (96, 320), nc=spec.nc)
    return step, state, batch


def test_3d_batch_sharding_placement():
    """calib (B,6) shards on dp; mean_sizes (nc,3) replicates."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = get_mesh(8)
    batch = graft.make_3d_batch(8, (96, 320), nc=3)
    sharded = shard_batch(batch, mesh)
    assert not sharded["calib"].sharding.is_fully_replicated
    assert sharded["mean_sizes"].sharding.is_fully_replicated
    assert not sharded["gt_depth"].sharding.is_fully_replicated


def test_3d_dp8_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    step, state, batch = _setup(B=8)
    s1, m1 = jax.jit(step)(state, batch)

    # rebuild state (the jitted step donates its input buffers)
    step2, state2, _ = _setup(B=8)
    mesh = get_mesh(8)
    pstep = make_parallel_train_step(step2, mesh)
    s8, m8 = pstep(replicate_state(state2, mesh), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
    for k in ("dep_om", "hd_oo", "box2d_om"):
        if k in m1:
            np.testing.assert_allclose(
                float(m8[k]), float(m1[k]), rtol=1e-4, err_msg=k
            )
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    err = max(float(jnp.abs(a - b).max()) for a, b in zip(flat1, flat8))
    assert err < 1e-4, err
