"""v8 task losses: seg + pose parity vs torch reference; obb/cls functional."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.train.loss_tasks import (
    classification_loss, obb_loss, pose_loss, segmentation_loss,
)

from _oracle import load_reference

NC = 4


def _make_det_batch(rng, B, M):
    cxy = rng.uniform(0.25, 0.75, (B, M, 2))
    wh = rng.uniform(0.1, 0.35, (B, M, 2))
    return {
        "gt_labels": jnp.asarray(rng.integers(0, NC, (B, M)).astype(np.int32)),
        "gt_bboxes": jnp.asarray(np.concatenate([cxy, wh], -1).astype(np.float32)),
        "mask_gt": jnp.ones((B, M), bool),
    }


def _ref_loss(cls_name, extra_args=None):
    import torch
    from types import SimpleNamespace

    load_reference()
    from ultralytics.utils import loss as ref_loss_mod

    head = SimpleNamespace(
        stride=torch.tensor([8.0, 16.0, 32.0]), nc=NC, no=NC + 64, reg_max=16,
        kpt_shape=[17, 3],
    )
    dummy = torch.nn.Parameter(torch.zeros(1))
    args = dict(box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0, overlap_mask=False)
    args.update(extra_args or {})
    model = SimpleNamespace(
        args=SimpleNamespace(**args), model=[head], parameters=lambda: iter([dummy])
    )
    return getattr(ref_loss_mod, cls_name)(model)


def test_segmentation_loss_parity():
    import torch

    rng = np.random.default_rng(11)
    B, M, Hm, Wm, nm = 2, 3, 16, 24, 32
    h0, w0 = 8, 12
    det_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 64 + NC)).astype(np.float32) * 0.4
        for i in range(3)
    ]
    for f in det_np:
        f[..., :64] += 1.0
    mc_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, nm)).astype(np.float32) * 0.3
        for i in range(3)
    ]
    protos_np = rng.standard_normal((B, Hm, Wm, nm)).astype(np.float32) * 0.3
    batch = _make_det_batch(rng, B, M)
    gt_masks = (rng.uniform(0, 1, (B, M, Hm, Wm)) > 0.6).astype(np.float32)
    batch["gt_masks"] = jnp.asarray(gt_masks)

    total, items = jax.jit(
        lambda p, b: segmentation_loss(p, b, nc=NC, strides=(8, 16, 32))
    )(
        {
            "det": [jnp.asarray(f) for f in det_np],
            "mask_coefs": [jnp.asarray(m) for m in mc_np],
            "protos": jnp.asarray(protos_np),
        },
        batch,
    )

    # reference: flat-format batch, masks (N, Hm, Wm) with batch_idx
    ref = _ref_loss("v8SegmentationLoss")
    feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in det_np]
    mc_t = torch.cat(
        [torch.from_numpy(m.transpose(0, 3, 1, 2)).reshape(B, nm, -1) for m in mc_np], 2
    )
    proto_t = torch.from_numpy(protos_np.transpose(0, 3, 1, 2))
    bidx = np.repeat(np.arange(B), M).astype(np.float32)
    batch_t = {
        "batch_idx": torch.from_numpy(bidx),
        "cls": torch.from_numpy(np.asarray(batch["gt_labels"]).reshape(-1, 1).astype(np.float32)),
        "bboxes": torch.from_numpy(np.asarray(batch["gt_bboxes"]).reshape(-1, 4)),
        "masks": torch.from_numpy(gt_masks.reshape(B * M, Hm, Wm)),
    }
    ref_total, ref_items = ref((feats_t, mc_t, proto_t), batch_t)
    ours = np.array([float(items[k]) for k in ("box", "seg", "cls", "dfl")])
    np.testing.assert_allclose(ours, ref_items.numpy(), rtol=2e-3, atol=1e-4)


def test_pose_loss_parity():
    import torch

    rng = np.random.default_rng(12)
    B, M = 2, 3
    h0, w0 = 8, 12
    det_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 64 + NC)).astype(np.float32) * 0.4
        for i in range(3)
    ]
    for f in det_np:
        f[..., :64] += 1.0
    kpt_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 51)).astype(np.float32) * 0.3
        for i in range(3)
    ]
    batch = _make_det_batch(rng, B, M)
    gt_kpts = rng.uniform(0.1, 0.9, (B, M, 17, 3)).astype(np.float32)
    gt_kpts[..., 2] = (rng.uniform(0, 1, (B, M, 17)) > 0.3).astype(np.float32) * 2
    batch["gt_kpts"] = jnp.asarray(gt_kpts)

    total, items = jax.jit(
        lambda p, b: pose_loss(p, b, nc=NC, strides=(8, 16, 32))
    )(
        {"det": [jnp.asarray(f) for f in det_np], "kpts": [jnp.asarray(k) for k in kpt_np]},
        batch,
    )

    ref = _ref_loss("v8PoseLoss")
    feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in det_np]
    kpt_t = torch.cat(
        [torch.from_numpy(k.transpose(0, 3, 1, 2)).reshape(B, 51, -1) for k in kpt_np], 2
    )
    bidx = np.repeat(np.arange(B), M).astype(np.float32)
    batch_t = {
        "batch_idx": torch.from_numpy(bidx),
        "cls": torch.from_numpy(np.asarray(batch["gt_labels"]).reshape(-1, 1).astype(np.float32)),
        "bboxes": torch.from_numpy(np.asarray(batch["gt_bboxes"]).reshape(-1, 4)),
        "keypoints": torch.from_numpy(gt_kpts.reshape(B * M, 17, 3)),
    }
    ref_total, ref_items = ref((feats_t, kpt_t), batch_t)
    ours = np.array([float(items[k]) for k in ("box", "pose", "kobj", "cls", "dfl")])
    np.testing.assert_allclose(ours, ref_items.numpy(), rtol=2e-3, atol=1e-4)


def test_classification_loss():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    labels = jnp.asarray([0, 1])
    loss, items = classification_loss(logits, labels)
    import torch

    ref = torch.nn.functional.cross_entropy(
        torch.tensor([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]]), torch.tensor([0, 1])
    )
    assert abs(float(loss) - ref.item()) < 1e-6


def test_obb_loss_runs_finite():
    rng = np.random.default_rng(13)
    B, M = 2, 3
    h0, w0 = 8, 8
    det = [
        jnp.asarray(rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 64 + NC)).astype(np.float32) * 0.4 + 0.5)
        for i in range(3)
    ]
    angle = [
        jnp.asarray(rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 1)).astype(np.float32))
        for i in range(3)
    ]
    cxy = rng.uniform(0.3, 0.7, (B, M, 2))
    wh = rng.uniform(0.15, 0.4, (B, M, 2))
    r = rng.uniform(-0.7, 2.0, (B, M, 1))
    batch = {
        "gt_labels": jnp.asarray(rng.integers(0, NC, (B, M)).astype(np.int32)),
        "gt_bboxes": jnp.asarray(np.concatenate([cxy, wh, r], -1).astype(np.float32)),
        "mask_gt": jnp.ones((B, M), bool),
    }
    total, items = jax.jit(lambda p, b: obb_loss(p, b, nc=NC, strides=(8, 16, 32)))(
        {"det": det, "angle": angle}, batch
    )
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in items.values())
