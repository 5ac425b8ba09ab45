"""Cross-framework LOCKSTEP training parity (VERDICT r3 item #1a).

One-step gradient parity (test_grad_parity.py) cannot catch optimizer-,
schedule-, EMA-, or BN-running-stat divergences: a wrong weight-decay
coupling or a biased running-var update passes every existing test and
silently mistrains. Four layers of evidence here:

1. ``test_batchnorm_running_stats_match_torch`` — torch's UNBIASED
   running-var update (nn/modules.py TorchBatchNorm vs flax's biased one).
2. ``test_optimizer_semantics_vs_torch`` — train/optim.build_optimizer vs
   torch.optim on PRESCRIBED identical gradients: pins AdamW decoupled /
   SGD coupled weight-decay order, the kernel-only decay mask, b1=momentum,
   global-norm clip, per-group warmup (bias lr from warmup_bias_lr,
   trainer.py:384-393; SGD momentum ramp), the per-epoch LambdaLR schedule,
   and the EMA decay ramp — EXACTLY (1e-5), because both sides consume the
   same gradient stream.
3. ``test_lockstep_trajectory_sgd`` — 30 full train steps through the REAL
   product path (make_train_step) vs the reference model+loss+optimizer from
   identical converted weights and identical batches: per-step losses and
   final params/EMA/BN stats agree. SGD's update is linear in the gradient,
   so fp32 drift stays bounded.
4. ``test_lockstep_first_steps_adamw`` — the same end-to-end lockstep for
   the fork-default AdamW, over the window where it is numerically
   meaningful. Adam normalizes each coordinate by its own magnitude
   (mhat/sqrt(vhat) ~= sign(g) early), so a 1e-6 gradient difference flips
   near-zero coordinates by the full +-lr: a measured CONTROL (torch vs
   torch, 1e-6 relative param perturbation, same 30-step AdamW run) diverges
   to 88% loss error by step 3 and 56% final-parameter error — the
   cross-framework run sits INSIDE that intrinsic-chaos envelope (27%).
   Numbers recorded in PARITY.md round 4.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_loss_parity import _make_batch, _padded

B, NC = 2, 80
H, W = 64, 96
STEPS_PER_EPOCH = 5
EPOCHS = 6
N_STEPS = STEPS_PER_EPOCH * EPOCHS
LR0, LRF, MOMENTUM, WD = 0.01, 0.1, 0.937, 5e-4


def test_batchnorm_running_stats_match_torch():
    """TorchBatchNorm's running mean/var updates are bit-compatible with
    torch.nn.BatchNorm2d(momentum=0.03, eps=1e-3) — including the Bessel
    correction torch applies to the running-var update (flax.linen.BatchNorm
    does not), which matters at small spatial extents."""
    import torch

    from yolov10_3d_tpu.nn.modules import TorchBatchNorm

    c = 8
    bn_t = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.03).train()
    bn_j = TorchBatchNorm(use_running_average=False, momentum=0.97, epsilon=1e-3)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 3, 5, c)).astype(np.float32)  # n=30 per channel
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    apply = jax.jit(lambda v, x: bn_j.apply(v, x, mutable=["batch_stats"]))
    for i in range(6):
        x = rng.standard_normal((2, 3, 5, c)).astype(np.float32) * (1 + i)
        y_t = bn_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        y_j, mut = apply(variables, jnp.asarray(x))
        variables = {**variables, "batch_stats": mut["batch_stats"]}
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5, err_msg=f"normalized output, step {i}",
        )
    bs = variables["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), bn_t.running_mean.numpy(), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(bs["var"]), bn_t.running_var.numpy(), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("opt_name", ["AdamW", "SGD", "RMSProp"])
def test_optimizer_semantics_vs_torch(opt_name):
    """build_optimizer vs torch.optim on a PRESCRIBED gradient stream:
    identical grads in, parameters must stay identical through 200 steps
    covering warmup (120 steps incl. bias-lr + SGD-momentum ramps), the
    per-epoch schedule, a clip-triggering step, masked weight decay, and the
    EMA ramp. No model in the loop — this is exact."""
    import torch

    from yolov10_3d_tpu.train.optim import build_optimizer, ema_update

    spe, epochs, wu_epochs = 40, 5, 3
    nw = max(round(wu_epochs * spe), 100)  # = 120
    n_steps = spe * epochs
    wbl, wmom = 0.1, 0.8

    rng = np.random.default_rng(7)
    init = {
        "c1": {"kernel": rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * 0.1,
               "bias": rng.standard_normal(8).astype(np.float32) * 0.1},
        "bn": {"scale": np.ones(8, np.float32),
               "bias": np.zeros(8, np.float32)},
        "c2": {"kernel": rng.standard_normal((16, 8)).astype(np.float32) * 0.1},
    }
    grads = []
    for i in range(n_steps):
        scale = 1e3 if i == 37 else 1.0  # step 37: trigger global-norm clip
        grads.append(jax.tree.map(
            lambda p: (rng.standard_normal(p.shape).astype(np.float32) * 0.3 * scale),
            init,
        ))

    # ---- torch mirror of the reference's groups/warmup/schedule/EMA ----
    t = {k: {kk: torch.nn.Parameter(torch.from_numpy(vv.copy()))
             for kk, vv in sub.items()} for k, sub in init.items()}
    g_bias = [t["c1"]["bias"], t["bn"]["bias"]]
    g_norm = [t["bn"]["scale"]]
    g_decay = [t["c1"]["kernel"], t["c2"]["kernel"]]
    if opt_name == "AdamW":
        opt = torch.optim.AdamW(g_bias, lr=LR0, betas=(MOMENTUM, 0.999),
                                weight_decay=0.0)
    elif opt_name == "RMSProp":
        # exactly the reference's construction (trainer.py:779): defaults
        # alpha=0.99, eps=1e-8, plus the momentum buffer
        opt = torch.optim.RMSprop(g_bias, lr=LR0, momentum=MOMENTUM)
    else:
        opt = torch.optim.SGD(g_bias, lr=LR0, momentum=MOMENTUM, nesterov=True)
    opt.add_param_group({"params": g_decay, "weight_decay": WD})
    opt.add_param_group({"params": g_norm, "weight_decay": 0.0})
    lf = lambda e: (1 - e / epochs) * (1.0 - LRF) + LRF
    all_params = g_bias + g_norm + g_decay
    ema_t = {k: {kk: vv.detach().clone() for kk, vv in sub.items()}
             for k, sub in t.items()}

    def torch_step(ni, g):
        epoch = ni // spe
        for j, group in enumerate(opt.param_groups):
            if ni < nw:  # reference trainer.py:384-393 per-batch warmup
                start = wbl if j == 0 else 0.0
                group["lr"] = np.interp(ni, [0, nw], [start, LR0 * lf(epoch)])
                if "momentum" in group:
                    group["momentum"] = np.interp(ni, [0, nw], [wmom, MOMENTUM])
            else:
                group["lr"] = LR0 * lf(epoch)
                if "momentum" in group:
                    group["momentum"] = MOMENTUM
        for k, sub in t.items():
            for kk, p in sub.items():
                p.grad = torch.from_numpy(np.asarray(g[k][kk]).copy())
        torch.nn.utils.clip_grad_norm_(all_params, max_norm=10.0)
        opt.step()
        d = 0.9999 * (1 - math.exp(-(ni + 1) / 2000))
        for k, sub in ema_t.items():
            for kk, v in sub.items():
                v.mul_(d).add_(t[k][kk].detach(), alpha=1 - d)

    # ---- ours: the real optax chain + ema_update ----
    params = jax.tree.map(jnp.asarray, init)
    tx, _ = build_optimizer(
        params, name=opt_name, lr0=LR0, lrf=LRF, momentum=MOMENTUM,
        weight_decay=WD, epochs=epochs, steps_per_epoch=spe,
        warmup_epochs=wu_epochs, nbs=B, batch_size=B,
        warmup_bias_lr=wbl, warmup_momentum=wmom,
    )
    opt_state = tx.init(params)
    ema_j = jax.tree.map(jnp.copy, params)

    @jax.jit
    def j_step(params, opt_state, ema, g, step):
        updates, opt_state = tx.update(g, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        ema = ema_update(ema, params, step + 1)
        return params, opt_state, ema

    for ni, g in enumerate(grads):
        torch_step(ni, g)
        params, opt_state, ema_j = j_step(
            params, opt_state, ema_j, jax.tree.map(jnp.asarray, g),
            jnp.asarray(ni, jnp.int32),
        )
        if ni in (0, 37, nw - 1, nw, n_steps - 1):
            for k, sub in t.items():
                for kk, p in sub.items():
                    np.testing.assert_allclose(
                        np.asarray(params[k][kk]), p.detach().numpy(),
                        # atol floors near-zero elements: RMSprop's normalized
                        # updates accumulate a few-ulp fp32 drift that is
                        # ~3e-6 absolute on ~0.01-magnitude coords by step 200
                        rtol=1e-4, atol=1e-5,
                        err_msg=f"{opt_name} step {ni} {k}.{kk}",
                    )
    for k, sub in ema_t.items():
        for kk, v in sub.items():
            np.testing.assert_allclose(
                np.asarray(ema_j[k][kk]), v.numpy(), rtol=1e-4, atol=1e-5,
                err_msg=f"{opt_name} EMA {k}.{kk}",
            )


def _torch_model_groups(model):
    """The reference build_optimizer 3-way split (trainer.py:766-776):
    biases / norm weights / everything else (= decayed weights)."""
    import torch

    bn_types = tuple(
        v for k, v in torch.nn.__dict__.items()
        if "Norm" in k and isinstance(v, type)
    )
    g_decay, g_norm, g_bias = [], [], []
    for _, module in model.named_modules():
        for pname, p in module.named_parameters(recurse=False):
            if not p.requires_grad:
                continue  # the frozen DFL projection
            if pname == "bias":
                g_bias.append(p)
            elif isinstance(module, bn_types):
                g_norm.append(p)
            else:
                g_decay.append(p)
    return g_decay, g_norm, g_bias


def _run_torch_trajectory(ref, opt_name, batches):
    """N optimizer steps through the reference model/loss with the reference's
    optimizer-group, schedule, clip, and EMA semantics (warmup off). Returns
    (per-step losses, final state_dict, EMA state_dict)."""
    import torch
    from types import SimpleNamespace

    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.loss import v10DetectLoss

    ref.train()
    ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    loss_fn = v10DetectLoss(ref)

    g_decay, g_norm, g_bias = _torch_model_groups(ref)
    if opt_name == "AdamW":
        opt = torch.optim.AdamW(
            g_bias, lr=LR0, betas=(MOMENTUM, 0.999), weight_decay=0.0
        )
    else:
        opt = torch.optim.SGD(g_bias, lr=LR0, momentum=MOMENTUM, nesterov=True)
    opt.add_param_group({"params": g_decay, "weight_decay": WD})
    opt.add_param_group({"params": g_norm, "weight_decay": 0.0})
    lf = lambda e: (1 - e / EPOCHS) * (1.0 - LRF) + LRF
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lf)

    ema_sd = {k: v.detach().clone().float() for k, v in ref.state_dict().items()}
    losses = []
    for step, (x_np, batch_np) in enumerate(batches):
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        batch_t = {k: torch.from_numpy(v) for k, v in batch_np.items()}
        total, _ = loss_fn(ref(x_t), batch_t)
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=10.0)
        opt.step()
        losses.append(float(total.detach()))
        d = 0.9999 * (1 - math.exp(-(step + 1) / 2000))
        msd = ref.state_dict()
        for k, v in ema_sd.items():
            if v.dtype.is_floating_point:
                v *= d
                v += (1 - d) * msd[k].detach().float()
        if (step + 1) % STEPS_PER_EPOCH == 0:
            sched.step()
    final_sd = {k: v.detach().cpu().numpy().copy() for k, v in ref.state_dict().items()}
    ema_np = {k: v.numpy() for k, v in ema_sd.items()}
    return losses, final_sd, ema_np


def _tree_rel_err(got, want):
    """Global relative L2 error between two identical pytrees."""
    gl, wl = jax.tree.leaves(got), jax.tree.leaves(want)
    num = sum(float(jnp.sum((g.astype(jnp.float64) - jnp.asarray(w, jnp.float64)) ** 2))
              for g, w in zip(gl, wl))
    den = sum(float(jnp.sum(jnp.asarray(w, jnp.float64) ** 2)) for w in wl) + 1e-30
    return math.sqrt(num / den)


def _lockstep_setup(n_steps):
    import torch

    from _helpers import build_jax
    from _oracle import reference_model, state_dict_numpy
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

    torch.manual_seed(0)
    ref = reference_model("yolov10n")
    model, spec, variables = build_jax("n", H, W)
    sd0 = state_dict_numpy(ref)
    variables = convert_torch_state_dict(
        {k: v for k, v in sd0.items() if "dfl" not in k}, variables
    )
    rng = np.random.default_rng(40)
    batches = []
    for _ in range(n_steps):
        x = (rng.standard_normal((B, H, W, 3)).astype(np.float32) * 0.35 + 0.5)
        bi, cls, bb = _make_batch(rng, B, n_obj=4, nc=NC)
        batches.append((x, {"batch_idx": bi, "cls": cls, "bboxes": bb}))
    return ref, model, spec, variables, batches


def _run_jax_trajectory(model, spec, variables, opt_name, batches):
    from yolov10_3d_tpu.train.optim import build_optimizer
    from yolov10_3d_tpu.train.state import TrainState, make_train_step

    tx, _ = build_optimizer(
        variables["params"], name=opt_name, lr0=LR0, lrf=LRF, momentum=MOMENTUM,
        weight_decay=WD, epochs=EPOCHS, steps_per_epoch=STEPS_PER_EPOCH,
        warmup_epochs=0.0, nbs=B, batch_size=B,
    )
    step_fn = jax.jit(make_train_step(model, tx, nc=NC, strides=tuple(spec.strides)))
    state = TrainState.create(variables, tx)
    losses = []
    for x_np, b in batches:
        bj = _padded(b["batch_idx"], b["cls"], b["bboxes"], B, M=8)
        bj["img"] = jnp.asarray(x_np)
        state, metrics = step_fn(state, bj)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_lockstep_trajectory_sgd():
    """30 full SGD train steps, identical init + batches: per-step losses and
    final params/EMA/BN running stats agree (measured drift: per-step <=1.1e-2,
    final params 6.7e-3, BN 2.7e-2 — fp32 noise + occasional assigner
    tie-flips, bounded because SGD's update is linear in the gradient)."""
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

    ref, model, spec, variables, batches = _lockstep_setup(N_STEPS)
    t_losses, t_final, t_ema = _run_torch_trajectory(ref, "SGD", batches)
    j_losses, state = _run_jax_trajectory(model, spec, variables, "SGD", batches)

    for i, (lt, lj) in enumerate(zip(t_losses, j_losses)):
        rel = abs(lt - lj) / max(abs(lt), 1e-9)
        assert rel < 2.5e-2, (
            f"step {i}: torch {lt:.6f} vs jax {lj:.6f} (rel {rel:.2e})"
        )
    want = convert_torch_state_dict(
        {k: v for k, v in t_final.items() if "dfl" not in k}, variables
    )
    want_ema = convert_torch_state_dict(
        {k: v for k, v in t_ema.items() if "dfl" not in k}, variables
    )
    err_p = _tree_rel_err(state.params, want["params"])
    err_bs = _tree_rel_err(state.batch_stats, want["batch_stats"])
    err_e = _tree_rel_err(state.ema_params, want_ema["params"])
    assert err_p < 3e-2, f"final params rel err {err_p:.2e}"
    assert err_bs < 8e-2, f"BN running stats rel err {err_bs:.2e}"
    assert err_e < 3e-2, f"EMA params rel err {err_e:.2e}"


def test_lockstep_first_steps_adamw():
    """End-to-end AdamW lockstep over the window where Adam trajectories are
    comparable at all (see module docstring: by step ~2-3 even torch vs
    torch diverges under a 1e-6 perturbation). Measured: 4.5e-5 / 4.0e-3."""
    ref, model, spec, variables, batches = _lockstep_setup(2)
    t_losses, _, _ = _run_torch_trajectory(ref, "AdamW", batches)
    j_losses, _ = _run_jax_trajectory(model, spec, variables, "AdamW", batches)
    for i, (lt, lj) in enumerate(zip(t_losses, j_losses)):
        rel = abs(lt - lj) / max(abs(lt), 1e-9)
        assert rel < 1e-2, (
            f"step {i}: torch {lt:.6f} vs jax {lj:.6f} (rel {rel:.2e})"
        )


def test_resolve_auto_optimizer():
    """optimizer=auto resolves by the reference's fitted rule
    (trainer.py:757-764): SGD for >10k-iteration runs, AdamW with the
    nc-fitted lr otherwise, bias warmup 0 either way."""
    from yolov10_3d_tpu.train.optim import resolve_auto_optimizer

    # COCO-scale long run -> SGD
    assert resolve_auto_optimizer(80, 118287, 16, 64, 100) == (
        "SGD", 0.01, 0.9, 0.0,
    )
    # 8-image smoke run -> AdamW, lr = round(0.01 / (4 + nc), 6)
    name, lr, mom, wbl = resolve_auto_optimizer(80, 128, 16, 64, 10)
    assert (name, mom, wbl) == ("AdamW", 0.9, 0.0)
    assert lr == round(0.002 * 5 / 84, 6)
