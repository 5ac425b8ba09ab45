"""Tensor-parallel (channel-sharded) mesh legs: a (dp, tp) step must compute
the SAME numbers as the replicated/dp-only step — tp is a layout choice, not
a math change. Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.parallel.mesh import (
    channel_sharding,
    get_mesh,
    get_mesh_tp,
    make_parallel_train_step,
    make_tp_eval_step,
    make_tp_train_step,
    replicate_state,
    shard_batch,
    shard_state_channels,
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


def test_tp_eval_matches_replicated(setup):
    model, spec, variables, batch = setup
    imgs = batch["img"]
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False)["one2one"])(
        variables, imgs
    )

    mesh = get_mesh_tp(4, 2)
    fn, vars_tp = make_tp_eval_step(
        lambda v, x: model.apply(v, x, train=False)["one2one"], mesh, variables
    )
    imgs_dp = jax.device_put(imgs, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp")))
    out = fn(vars_tp, imgs_dp)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), rtol=2e-4, atol=2e-5
        )


def test_tp_train_step_matches_dp(setup):
    model, spec, variables, batch = setup
    tx, _ = build_optimizer(
        variables["params"], epochs=1, steps_per_epoch=1, batch_size=8, nbs=8,
        warmup_epochs=0.0,
    )
    step = make_train_step(model, tx, nc=spec.nc, strides=spec.strides)

    # build BOTH states before running: the train steps donate their state,
    # and replicate_state/device_put may alias the underlying `variables`
    # buffers (donating one would invalidate the other's init)
    fresh = lambda: jax.tree.map(jnp.copy, variables)  # noqa: E731
    mesh_dp = get_mesh(8)
    st_dp = replicate_state(TrainState.create(fresh(), tx), mesh_dp)
    mesh_tp = get_mesh_tp(4, 2)
    st_tp = shard_state_channels(TrainState.create(fresh(), tx), mesh_tp)

    new_dp, m_dp = make_parallel_train_step(step, mesh_dp)(
        st_dp, shard_batch(dict(batch), mesh_dp)
    )
    new_tp, m_tp = make_tp_train_step(step, mesh_tp, st_tp)(
        st_tp, shard_batch(dict(batch), mesh_tp)
    )

    assert np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-4
    )
    # spot-check updated params agree (different reduction layouts -> loose tol)
    p_dp = jax.device_get(new_dp.params["model_0"])
    p_tp = jax.device_get(new_tp.params["model_0"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5),
        p_dp, p_tp,
    )
    # tp really sharded: a conv kernel's committed sharding names the tp axis
    k = new_tp.params["model_0"]["conv"]["kernel"]
    assert "tp" in str(k.sharding.spec)


def test_channel_sharding_rule():
    mesh = get_mesh_tp(4, 2)
    tree = {
        "kernel": jnp.zeros((3, 3, 16, 32)),
        "odd": jnp.zeros((7,)),
        "scalar": jnp.zeros(()),
    }
    sh = channel_sharding(mesh, tree)
    assert "tp" in str(sh["kernel"].spec)
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()
