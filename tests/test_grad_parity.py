"""Gradient parity vs the torch reference (VERDICT r2 item #4).

Value-level loss parity cannot catch stop-gradient/detach mismatches: the
reference runs its assigner under no_grad (loss.py:218 ``torch.no_grad``)
and detaches the one2one head's input features (head.py:520) — a missing
``stop_gradient`` on our side would pass every value test and silently
mistrain. These tests compare actual gradients:

  * d(loss)/d(feature maps) for the v8 detection loss (both tal_topk),
  * d(loss)/d(feats) for the v10 dual loss (one2many + one2one inputs),
  * d(loss)/d(feats) for the 3D DDDetectionLoss (all six terms live),
  * full yolov10n model: d(loss)/d(input image) and the global parameter
    grad-norm, with converted reference weights — including the zero-grad
    detach boundary of the one2one branch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.train.loss import detection_loss, v10_detect_loss
from yolov10_3d_tpu.train.loss3d import dd_detection_loss

from test_loss_parity import _make_batch, _padded, _ref_loss_fn
from test_loss3d_parity import HYP, MEAN_SIZES, NC as NC3D, _ref_loss


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _assert_grads_close(ours_nhwc, torch_grad_nchw, name, rtol=1e-3):
    ref = _to_nhwc(torch_grad_nchw)
    ours = np.asarray(ours_nhwc, np.float32)
    # grads span orders of magnitude; compare with an atol scaled to the
    # tensor's own magnitude so near-zero entries don't dominate
    atol = 1e-5 * max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("topk", [10, 1])
def test_detection_loss_feat_grad_parity(topk):
    import torch

    rng = np.random.default_rng(11)
    B, nc = 2, 80
    h0, w0 = 8, 12
    feats_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 144)).astype(np.float32)
        for i in range(3)
    ]
    batch_idx, cls, bboxes = _make_batch(rng, B, n_obj=5, nc=nc)

    ref_fn = _ref_loss_fn(topk, nc)
    feats_t = [
        torch.from_numpy(f.transpose(0, 3, 1, 2)).requires_grad_(True)
        for f in feats_np
    ]
    batch_t = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(bboxes),
    }
    ref_total, _ = ref_fn(feats_t, batch_t)
    ref_total.backward()

    batch_j = _padded(batch_idx, cls, bboxes, B, M=8)
    grads = jax.jit(
        jax.grad(
            lambda f, b: detection_loss(
                f, b, nc=nc, strides=(8, 16, 32), gains=(7.5, 0.5, 1.5),
                tal_topk=topk,
            )[0]
        )
    )([jnp.asarray(f) for f in feats_np], batch_j)

    for i in range(3):
        _assert_grads_close(grads[i], feats_t[i].grad, f"topk={topk} feats[{i}]")


def test_v10_dual_loss_feat_grad_parity():
    """The dual loss backward through BOTH branches: one2many (topk=10) and
    one2one (topk=1) feats get independent gradients (reference loss.py:727
    v10DetectLoss sums both branch losses)."""
    import torch
    from types import SimpleNamespace

    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.loss import v10DetectLoss

    rng = np.random.default_rng(12)
    B, nc = 2, 80
    h0, w0 = 8, 12
    om_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 144)).astype(np.float32)
        for i in range(3)
    ]
    oo_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 144)).astype(np.float32)
        for i in range(3)
    ]
    batch_idx, cls, bboxes = _make_batch(rng, B, n_obj=4, nc=nc)

    head = SimpleNamespace(
        stride=torch.tensor([8.0, 16.0, 32.0]), nc=nc, no=nc + 64, reg_max=16
    )
    model = SimpleNamespace(
        args=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5),
        model=[head],
        parameters=lambda: iter([torch.nn.Parameter(torch.zeros(1))]),
    )
    ref_fn = v10DetectLoss(model)
    om_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)).requires_grad_(True) for f in om_np]
    oo_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)).requires_grad_(True) for f in oo_np]
    batch_t = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(bboxes),
    }
    ref_total, _ = ref_fn({"one2many": om_t, "one2one": oo_t}, batch_t)
    ref_total.backward()

    batch_j = _padded(batch_idx, cls, bboxes, B, M=8)

    def total(om, oo, b):
        t, _ = v10_detect_loss(
            {"one2many": om, "one2one": oo}, b, nc=nc, strides=(8, 16, 32)
        )
        return t

    g_om, g_oo = jax.jit(jax.grad(total, argnums=(0, 1)))(
        [jnp.asarray(f) for f in om_np], [jnp.asarray(f) for f in oo_np], batch_j
    )
    for i in range(3):
        _assert_grads_close(g_om[i], om_t[i].grad, f"one2many[{i}]")
        _assert_grads_close(g_oo[i], oo_t[i].grad, f"one2one[{i}]")


def test_dd_loss_feat_grad_parity():
    """3D loss gradients: all six terms (box2d/cls/dep/o3d/s3d/hd) flow into
    the shared feature maps; parity here pins the assigner's no-grad boundary
    and every 3D head-branch backward (reference loss.py:774-963)."""
    import torch

    from test_loss3d_parity import test_dd_loss_parity as _  # noqa: F401 (setup shapes doc)

    rng = np.random.default_rng(13)
    B, M = 2, 5
    h0, w0 = 12, 20
    imgw, imgh = w0 * 8, h0 * 8
    feats_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, NC3D + 35)).astype(np.float32) * 0.5
        for i in range(3)
    ]
    for f in feats_np:
        f[..., NC3D + 2 : NC3D + 4] += 4.0
        f[..., NC3D + 36 - 2] += 20.0
    n = B * M
    batch_idx = np.repeat(np.arange(B), M).astype(np.float32)
    cls = rng.integers(0, NC3D, (n, 1)).astype(np.float32)
    cxy = rng.uniform(0.25, 0.75, (n, 2))
    wh = rng.uniform(0.1, 0.4, (n, 2))
    bboxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    center_2d = (cxy * [imgw, imgh]).astype(np.float32)
    size_2d = (wh * [imgw, imgh]).astype(np.float32)
    center_3d = (center_2d + rng.normal(0, 3, (n, 2))).astype(np.float32)
    size_3d = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    depth = rng.uniform(5, 60, (n,)).astype(np.float32)
    heading_bin = rng.integers(0, 12, (n,)).astype(np.float32)
    heading_res = rng.uniform(-0.25, 0.25, (n,)).astype(np.float32)
    calib = np.tile([imgw / 2, imgh / 2, 700.0, 700.0, 0.0, 0.0], (B, 1)).astype(np.float32)

    ref = _ref_loss(8, HYP)
    feats_t = [
        torch.from_numpy(f.transpose(0, 3, 1, 2)).requires_grad_(True)
        for f in feats_np
    ]
    batch_t = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(bboxes),
        "center_2d": torch.from_numpy(center_2d),
        "size_2d": torch.from_numpy(size_2d),
        "center_3d": torch.from_numpy(center_3d),
        "size_3d": torch.from_numpy(size_3d),
        "depth": torch.from_numpy(depth),
        "heading_bin": torch.from_numpy(heading_bin),
        "heading_res": torch.from_numpy(heading_res),
        "calib": torch.from_numpy(calib),
        "mean_sizes": torch.from_numpy(MEAN_SIZES),
    }
    ref_total, _ = ref(feats_t, batch_t, embeddings=None)
    ref_total.backward()

    batch_j = {
        "gt_labels": jnp.asarray(cls.reshape(B, M).astype(np.int32)),
        "gt_bboxes": jnp.asarray(bboxes.reshape(B, M, 4)),
        "gt_center_2d": jnp.asarray(center_2d.reshape(B, M, 2)),
        "gt_size_2d": jnp.asarray(size_2d.reshape(B, M, 2)),
        "gt_center_3d": jnp.asarray(center_3d.reshape(B, M, 2)),
        "gt_size_3d": jnp.asarray(size_3d.reshape(B, M, 3)),
        "gt_depth": jnp.asarray(depth.reshape(B, M)),
        "gt_heading_bin": jnp.asarray(heading_bin.reshape(B, M)),
        "gt_heading_res": jnp.asarray(heading_res.reshape(B, M)),
        "mask_gt": jnp.ones((B, M), bool),
        "calib": jnp.asarray(calib),
        "mean_sizes": jnp.asarray(MEAN_SIZES),
    }
    grads = jax.jit(
        jax.grad(
            lambda f, b: dd_detection_loss(
                f, b, nc=NC3D, strides=(8, 16, 32), hyp=HYP, tal_topk=8
            )[0]
        )
    )([jnp.asarray(f) for f in feats_np], batch_j)

    for i in range(3):
        _assert_grads_close(grads[i], feats_t[i].grad, f"3d feats[{i}]", rtol=2e-3)


@pytest.mark.slow
def test_model_grad_parity():
    """End-to-end backward through yolov10n with converted reference weights:
    d(dual loss)/d(input image) matches torch, the GLOBAL parameter grad-norm
    matches, and the one2one detach boundary (head.py:520) holds: a one2one-
    only loss sends ZERO gradient into the input image in both frameworks."""
    import torch
    from types import SimpleNamespace

    from _helpers import build_jax
    from _oracle import load_reference, reference_model, state_dict_numpy
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

    load_reference()
    from ultralytics.utils.loss import v10DetectLoss

    ref = reference_model("yolov10n")
    model, spec, variables = build_jax("n")
    sd = state_dict_numpy(ref)
    variables = convert_torch_state_dict(
        {k: v for k, v in sd.items() if "dfl" not in k}, variables
    )

    rng = np.random.default_rng(14)
    B, nc = 2, 80
    x_np = (rng.standard_normal((B, 64, 96, 3)).astype(np.float32) * 0.4 + 0.5)
    batch_idx, cls, bboxes = _make_batch(rng, B, n_obj=4, nc=nc)

    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    ref.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    loss_fn = v10DetectLoss(ref)
    x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2)).requires_grad_(True)
    batch_t = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(bboxes),
    }
    ref_total, _ = loss_fn(ref(x_t), batch_t)
    ref_total.backward()
    ref_img_grad = x_t.grad.numpy().transpose(0, 2, 3, 1)
    ref_pnorm = float(
        sum(
            (p.grad.double() ** 2).sum()
            for p in ref.parameters()
            if p.grad is not None
        ).sqrt()
    )

    batch_j = _padded(batch_idx, cls, bboxes, B, M=8)

    def total(params, x, branches=("one2many", "one2one")):
        preds = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        t = 0.0
        for br, topk in (("one2many", 10), ("one2one", 1)):
            if br in branches:
                t += detection_loss(
                    preds[br], batch_j, nc=nc, strides=spec.strides,
                    gains=(7.5, 0.5, 1.5), tal_topk=topk,
                )[0]
        return t

    x_j = jnp.asarray(x_np)
    g_img = jax.jit(jax.grad(total, argnums=1))(variables["params"], x_j)
    np.testing.assert_allclose(
        np.asarray(g_img), ref_img_grad, rtol=2e-3,
        atol=1e-5 * np.abs(ref_img_grad).max(),
        err_msg="d(loss)/d(image)",
    )

    g_params = jax.jit(jax.grad(total, argnums=0))(variables["params"], x_j)
    pnorm = float(
        jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float64) ** 2) for g in jax.tree.leaves(g_params))
        )
    )
    np.testing.assert_allclose(pnorm, ref_pnorm, rtol=2e-3, err_msg="param grad norm")

    # detach boundary: one2one-only loss -> zero image gradient (both sides)
    g_oo = jax.jit(
        jax.grad(lambda p, x: total(p, x, branches=("one2one",)), argnums=1)
    )(variables["params"], x_j)
    assert float(jnp.abs(g_oo).max()) == 0.0, "one2one branch leaks into backbone"
    x_t2 = torch.from_numpy(x_np.transpose(0, 3, 1, 2)).requires_grad_(True)
    oo_loss = v10DetectLoss(ref).one2one(ref(x_t2)["one2one"], batch_t)[0]
    oo_loss.backward()
    # torch never populates .grad for a disconnected graph — the detached
    # one2one input leaves the image out of the autograd graph entirely
    assert x_t2.grad is None or float(x_t2.grad.abs().max()) == 0.0
