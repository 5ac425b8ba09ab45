"""FSDP/ZeRO-3 mesh leg: params + optimizer state + EMA sharded over the SAME
dp axis the batch is sharded on (per-chip weight/optimizer memory 1/dp; XLA
all-gathers weights at use sites and reduce-scatters grads from sharding
propagation). Must compute the SAME numbers as the replicated dp step — FSDP
is a layout choice, not a math change. Runs on the virtual 8-device CPU mesh
(conftest). The reference's NCCL DDP (trainer.py:191-215) always replicates
optimizer state; ZeRO is the standard memory fix and falls out of shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.parallel.mesh import (
    fsdp_sharding,
    get_mesh,
    make_fsdp_train_step,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
    shard_state_fsdp,
)
from yolov10_3d_tpu.train.optim import build_optimizer
from yolov10_3d_tpu.train.state import TrainState, make_train_step


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "img": jnp.asarray(rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32)),
        "gt_labels": jnp.zeros((B, 4), jnp.int32),
        "gt_bboxes": jnp.asarray(
            np.concatenate(
                [rng.uniform(0.3, 0.7, (B, 4, 2)), rng.uniform(0.1, 0.3, (B, 4, 2))],
                -1,
            ).astype(np.float32)
        ),
        "mask_gt": jnp.ones((B, 4), bool),
    }
    return model, spec, variables, batch


def test_fsdp_train_step_matches_dp(setup):
    model, spec, variables, batch = setup
    tx, _ = build_optimizer(
        variables["params"], epochs=1, steps_per_epoch=1, batch_size=8, nbs=8,
        warmup_epochs=0.0,
    )
    step = make_train_step(model, tx, nc=spec.nc, strides=spec.strides)

    # build BOTH states before running: the train steps donate their state,
    # and replicate_state/device_put may alias the underlying `variables`
    fresh = lambda: jax.tree.map(jnp.copy, variables)  # noqa: E731
    mesh = get_mesh(8)
    st_dp = replicate_state(TrainState.create(fresh(), tx), mesh)
    st_fs = shard_state_fsdp(TrainState.create(fresh(), tx), mesh)

    new_dp, m_dp = make_parallel_train_step(step, mesh)(
        st_dp, shard_batch(dict(batch), mesh)
    )
    new_fs, m_fs = make_fsdp_train_step(step, mesh, st_fs)(
        st_fs, shard_batch(dict(batch), mesh)
    )

    assert np.isfinite(float(m_fs["loss"]))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]), rtol=1e-4)
    # spot-check updated params agree (different reduction layouts -> loose tol)
    p_dp = jax.device_get(new_dp.params["model_0"])
    p_fs = jax.device_get(new_fs.params["model_0"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5),
        p_dp, p_fs,
    )
    # really sharded: a conv kernel's committed sharding names the dp axis,
    # and its per-device shard is 1/8 of the leaf
    k = new_fs.params["model_0"]["conv"]["kernel"]
    assert "dp" in str(k.sharding.spec)
    assert k.addressable_shards[0].data.size * 8 == k.size
    # ...and the optimizer state is sharded too (the ZeRO point): find a
    # moment leaf matching that kernel and check its shard size
    opt_leaves = [
        x for x in jax.tree.leaves(new_fs.opt_state)
        if getattr(x, "shape", None) == k.shape
    ]
    assert opt_leaves, "no optimizer moment with the kernel's shape found"
    assert opt_leaves[0].addressable_shards[0].data.size * 8 == k.size


def test_fsdp_sharding_rule():
    mesh = get_mesh(8)
    tree = {
        "kernel": jnp.zeros((3, 3, 16, 32)),   # largest dim 32 -> sharded
        "vec": jnp.zeros((64,)),               # sharded
        "odd": jnp.zeros((7,)),                # replicated
        "small": jnp.zeros((3, 3)),            # replicated (no dim >= 8 divisible)
        "scalar": jnp.zeros(()),
    }
    sh = fsdp_sharding(mesh, tree)
    assert sh["kernel"].spec == jax.sharding.PartitionSpec(None, None, None, "dp")
    assert sh["vec"].spec == jax.sharding.PartitionSpec("dp")
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()
