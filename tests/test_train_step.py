"""Train-step behavior: finite grads, loss decreases, EMA tracks, and the
8-device data-parallel step matches single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.train.optim import build_optimizer
from yolov10_3d_tpu.train.state import TrainState, make_train_step, eval_variables
from yolov10_3d_tpu.parallel.mesh import (
    get_mesh, make_parallel_train_step, replicate_state, shard_batch,
)

from _helpers import build_jax


def _setup(batch_size=8, optimizer="AdamW"):
    model, spec, variables = build_jax("n")
    # build_jax caches variables; copy so donated buffers don't poison the cache
    variables = jax.tree.map(jnp.copy, variables)
    tx, lr_fn = build_optimizer(
        variables["params"],
        name=optimizer,
        lr0=0.01,
        epochs=10,
        steps_per_epoch=10,
        warmup_epochs=0.0,
        batch_size=batch_size,
        nbs=batch_size,  # no accumulation for the test
    )
    step = make_train_step(model, tx, nc=spec.nc, strides=spec.strides)
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.uniform(0, 1, (batch_size, 64, 64, 3)).astype(np.float32)),
        "gt_labels": jnp.asarray(rng.integers(0, 80, (batch_size, 4)).astype(np.int32)),
        "gt_bboxes": jnp.asarray(
            np.concatenate(
                [rng.uniform(0.3, 0.7, (batch_size, 4, 2)), rng.uniform(0.1, 0.3, (batch_size, 4, 2))],
                -1,
            ).astype(np.float32)
        ),
        "mask_gt": jnp.ones((batch_size, 4), bool),
    }
    return model, spec, step, state, batch


def test_train_step_overfits_small_batch():
    model, spec, step, state, batch = _setup()
    jstep = jax.jit(step, donate_argnums=0)
    losses = []
    for _ in range(8):
        state, metrics = jstep(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # EMA drifted from init but not equal to raw params
    ev = eval_variables(state)
    d = jax.tree.leaves(
        jax.tree.map(lambda a, b: jnp.abs(a - b).max(), ev["params"], state.params)
    )
    assert max(float(x) for x in d) > 0


def test_dp8_matches_single_device():
    # SGD, not AdamW: with warmup_epochs=0 the first step runs at full LR, and
    # AdamW's normalized update turns sign flips of near-zero grads (psum
    # reduction order differs across the mesh) into +-lr param jumps — a
    # property of the optimizer at step 1, not a sharding numerics bug. SGD's
    # update is linear in the gradient, so the comparison stays meaningful.
    model, spec, step, state, batch = _setup(batch_size=8, optimizer="SGD")
    # single device result
    s1, m1 = jax.jit(step)(state, batch)
    # 8-device data parallel
    mesh = get_mesh(8)
    pstep = make_parallel_train_step(step, mesh)
    s8, m8 = pstep(replicate_state(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
    # parameters after one step agree
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    err = max(float(jnp.abs(a - b).max()) for a, b in zip(flat1, flat8))
    assert err < 1e-4, err


def test_spatial_sharding_matches_single_device():
    """(dp=2, sp=4) image-height sharding: XLA's automatic halo exchanges
    must reproduce the single-device forward exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.parallel.mesh import (
        get_mesh_2d, make_spatial_eval_step, spatial_batch_sharding,
    )

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml", fast_eval=True
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 128, 128, 3)), jnp.float32
    )
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False)["one2one"])(v, x)

    mesh = get_mesh_2d(2, 4)
    fn = make_spatial_eval_step(
        lambda v, xx: model.apply(v, xx, train=False)["one2one"], mesh
    )
    got = fn(v, jax.device_put(x, spatial_batch_sharding(mesh)))
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)


def test_warmup_zero_means_no_warmup():
    """warmup_epochs=0 must disable warmup entirely (reference trainer.py
    ``nw = ... if warmup_epochs > 0 else -1``) — the 100-step floor otherwise
    pins tiny smoke-trains at ~0 LR for their whole run (round-3 finding: the
    overfit proof trained 30 epochs at <30% LR and reached mAP50=0)."""
    from yolov10_3d_tpu.train.optim import lr_schedule

    lr0 = 0.01
    # warmup disabled: step 0 already at the scheduled LR
    sched0 = lr_schedule(lr0, 0.01, epochs=10, steps_per_epoch=1, warmup_steps=0)
    assert float(sched0(0)) == pytest.approx(lr0, rel=1e-6)
    # warmup enabled: step 0 far below, ramps to scheduled by warmup end
    sched1 = lr_schedule(lr0, 0.01, epochs=10, steps_per_epoch=1, warmup_steps=100)
    assert float(sched1(0)) < 0.05 * lr0
    assert float(sched1(100)) == pytest.approx(float(sched0(100)), rel=1e-6)


def test_remat_model_grads_match_base():
    """remat=True (per-block jax.checkpoint) must be gradient-neutral.

    Exact in f64 (verified round 3: worst abs diff 0.0); in f32 the recompute
    reassociates BN-statistic reductions, so near-zero leaves carry relative
    noise — compare on the global grad norm instead of per-leaf relmax."""
    from yolov10_3d_tpu.nn.build import build_model

    cfg = "yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml"
    m0, spec = build_model(cfg)
    m1, _ = build_model(cfg, remat=True)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    v = jax.jit(m0.init, static_argnames="train")(jax.random.PRNGKey(0), x, train=False)

    def loss(m):
        def f(p):
            preds, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
                mutable=["batch_stats"],
            )
            return sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(preds))

        return f

    y0 = float(jax.jit(loss(m0))(v["params"]))
    y1 = float(jax.jit(loss(m1))(v["params"]))
    assert y0 == pytest.approx(y1, rel=1e-6)  # forward identical
    g0 = jax.jit(jax.grad(loss(m0)))(v["params"])
    g1 = jax.jit(jax.grad(loss(m1)))(v["params"])
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    den = sum(float(jnp.sum(a**2)) for a in jax.tree.leaves(g0))
    assert (num / den) ** 0.5 < 1e-3, (num, den)


def test_shard_batch_replicates_epoch_vectors():
    """A (12,) per-epoch vector whose length divides the mesh must be
    REPLICATED, not sharded (review finding: htl_weights on 4 devices)."""
    import jax
    import numpy as np

    from yolov10_3d_tpu.parallel.mesh import get_mesh, shard_batch

    mesh = get_mesh()
    n = len(jax.devices())
    B = n * 2
    batch = {
        "img": np.zeros((B, 8, 8, 3), np.float32),
        "htl_weights": np.arange(12, dtype=np.float32),  # 12 % n == 0 for n in (1,2,4)
        "gt_labels": np.zeros((B, 5), np.int32),
    }
    placed = shard_batch(batch, mesh)
    assert placed["htl_weights"].shape == (12,)
    assert placed["htl_weights"].sharding.is_fully_replicated
    assert placed["img"].shape == (B, 8, 8, 3)
    if n > 1:
        assert not placed["img"].sharding.is_fully_replicated
