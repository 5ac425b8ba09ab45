"""Parity of the JAX TAL assigner + detection loss vs the torch reference."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.train.loss import detection_loss, v10_detect_loss

from _oracle import load_reference


def _ref_loss_fn(tal_topk, nc=80, gains=(7.5, 0.5, 1.5)):
    import torch
    from types import SimpleNamespace

    load_reference()
    from ultralytics.utils.loss import v8DetectionLoss

    # v8DetectionLoss only reads model.args/model.model[-1] attrs; build a
    # minimal stand-in instead of a full DetectionModel for speed
    head = SimpleNamespace(
        stride=torch.tensor([8.0, 16.0, 32.0]),
        nc=nc,
        no=nc + 64,
        reg_max=16,
    )
    dummy_param = torch.nn.Parameter(torch.zeros(1))
    model = SimpleNamespace(
        args=SimpleNamespace(box=gains[0], cls=gains[1], dfl=gains[2]),
        model=[head],
        parameters=lambda: iter([dummy_param]),
    )
    return v8DetectionLoss(model, tal_topk=tal_topk)


def _make_batch(rng, B, n_obj, nc):
    batch_idx = np.repeat(np.arange(B), n_obj).astype(np.float32)
    cls = rng.integers(0, nc, (B * n_obj, 1)).astype(np.float32)
    cxy = rng.uniform(0.2, 0.8, (B * n_obj, 2))
    wh = rng.uniform(0.05, 0.3, (B * n_obj, 2))
    bboxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    return batch_idx, cls, bboxes


def _padded(batch_idx, cls, bboxes, B, M):
    from yolov10_3d_tpu.train.loss import pad_targets

    gt_labels, gt_bboxes, mask = pad_targets(batch_idx, cls, bboxes, B, M)
    return {
        "gt_labels": jnp.asarray(gt_labels),
        "gt_bboxes": jnp.asarray(gt_bboxes),
        "mask_gt": jnp.asarray(mask),
    }


def test_detection_loss_parity():
    import torch

    rng = np.random.default_rng(3)
    B, nc = 2, 80
    h0, w0 = 8, 12  # stride-8 map of a 64x96 input
    feats_np = [
        rng.standard_normal((B, h0 // (2**i) * 1, w0 // (2**i), 144)).astype(np.float32)
        for i in range(3)
    ]
    batch_idx, cls, bboxes = _make_batch(rng, B, n_obj=5, nc=nc)

    for topk in (10, 1):
        ref_fn = _ref_loss_fn(topk, nc)
        feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np]
        batch_t = {
            "batch_idx": torch.from_numpy(batch_idx),
            "cls": torch.from_numpy(cls),
            "bboxes": torch.from_numpy(bboxes),
        }
        ref_total, ref_items = ref_fn(feats_t, batch_t)

        batch_j = _padded(batch_idx, cls, bboxes, B, M=8)
        total, aux = jax.jit(
            lambda f, b: detection_loss(
                f, b, nc=nc, strides=(8, 16, 32), gains=(7.5, 0.5, 1.5), tal_topk=topk
            )
        )([jnp.asarray(f) for f in feats_np], batch_j)

        np.testing.assert_allclose(
            np.asarray(total), ref_total.item(), rtol=2e-4,
            err_msg=f"topk={topk} total",
        )
        ours = np.array([float(aux.box), float(aux.cls), float(aux.dfl)])
        np.testing.assert_allclose(ours, ref_items.numpy(), rtol=2e-4)


def test_v10_dual_loss_runs():
    rng = np.random.default_rng(4)
    B, nc = 2, 80
    feats = [
        jnp.asarray(rng.standard_normal((B, 8 // (2**i), 8 // (2**i), 144)).astype(np.float32))
        for i in range(3)
    ]
    batch_idx, cls, bboxes = _make_batch(rng, B, 3, nc)
    batch = _padded(batch_idx, cls, bboxes, B, M=4)
    total, aux = v10_detect_loss(
        {"one2many": feats, "one2one": feats}, batch, nc=nc, strides=(8, 16, 32)
    )
    assert np.isfinite(float(total))
    assert set(aux) == {"box_om", "cls_om", "dfl_om", "box_oo", "cls_oo", "dfl_oo"}
