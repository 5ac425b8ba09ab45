"""Oracle parity for the round-2 '🟢 tier' (VERDICT r2 item #7): components
that guard the 3D-distillation and task paths but previously had only
functional tests — DepthPredictor, FGDM loss + Balancer, OBB loss, and the
classification loss — compared against the torch reference."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _oracle import load_reference


def test_depth_predictor_parity():
    """reference nn/modules/head.py:978 ``DepthPredictor`` (MonoDETR-style)."""
    import torch

    load_reference()
    from ultralytics.nn.modules.head import DepthPredictor as RefDP

    from yolov10_3d_tpu.nn.heads3d import DepthPredictor
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

    torch.manual_seed(0)
    ch = (64, 128, 256)
    ref = RefDP(ch=ch).eval()

    B, h0, w0 = 2, 16, 24
    rng = np.random.default_rng(5)
    feats_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, ch[i])).astype(np.float32)
        for i in range(3)
    ]
    with torch.no_grad():
        logits_t, wd_t, emb_t = ref(
            [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np],
            return_embeddings=True,
        )

    ours = DepthPredictor(ch=ch)
    variables = jax.jit(ours.init)(
        jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats_np]
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if k != "depth_bin_values"}
    variables = convert_torch_state_dict(sd, variables)
    logits, wd, emb = jax.jit(ours.apply)(variables, [jnp.asarray(f) for f in feats_np])

    np.testing.assert_allclose(
        np.asarray(logits), logits_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=2e-4, err_msg="depth logits",
    )
    np.testing.assert_allclose(
        np.asarray(wd), wd_t.numpy(), rtol=1e-3, atol=2e-3, err_msg="weighted depth"
    )
    np.testing.assert_allclose(
        np.asarray(emb), emb_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=2e-4, err_msg="embeddings",
    )


def test_fgdm_loss_parity():
    """reference loss.py:1225 ``ForegroundDepthMapLoss`` + :1330 ``Balancer``.
    GT depth maps are constant within 16x16 blocks so the reference's
    NEAREST_EXACT 16x downsample and our floor-index downsample sample the
    same values (the binning/focal/balancer math is what's under test)."""
    import torch
    from types import SimpleNamespace

    load_reference()
    from ultralytics.utils.loss import ForegroundDepthMapLoss

    from yolov10_3d_tpu.train.fgdm import foreground_depth_map_loss

    rng = np.random.default_rng(6)
    B, H, W, D = 2, 12, 20, 80
    logits_np = rng.standard_normal((B, H, W, D + 1)).astype(np.float32)
    # block-constant depth maps at 16x the logits grid; ~40% background
    blocks = rng.uniform(0.5, 75.0, (B, H, W)).astype(np.float32)
    blocks[rng.random((B, H, W)) < 0.4] = 0.0
    depth_maps = np.repeat(np.repeat(blocks, 16, axis=1), 16, axis=2)

    model = SimpleNamespace(
        args=SimpleNamespace(min_depth_threshold=1.0, max_depth_threshold=70.0),
        parameters=lambda: iter([torch.nn.Parameter(torch.zeros(1))]),
    )
    ref_fn = ForegroundDepthMapLoss(model)
    ref = ref_fn(
        torch.from_numpy(logits_np.transpose(0, 3, 1, 2)),
        torch.from_numpy(depth_maps),
    )

    ours = foreground_depth_map_loss(
        jnp.asarray(logits_np), jnp.asarray(depth_maps),
        depth_min=1.0, depth_max=70.0, num_bins=D,
    )
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-4)


def test_classification_loss_parity():
    import torch

    load_reference()
    from ultralytics.utils.loss import v8ClassificationLoss

    from yolov10_3d_tpu.train.loss_tasks import classification_loss

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, (8,))
    ref, _ = v8ClassificationLoss()(
        torch.from_numpy(logits), {"cls": torch.from_numpy(labels)}
    )
    ours, _ = classification_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)


def test_obb_loss_parity():
    """reference loss.py:609 ``v8OBBLoss``: rotated TAL assignment (probiou),
    probiou box loss, DFL vs the axis-aligned hull."""
    import torch
    from types import SimpleNamespace

    load_reference()
    from ultralytics.utils.loss import v8OBBLoss

    from yolov10_3d_tpu.train.loss_tasks import obb_loss

    rng = np.random.default_rng(8)
    B, nc, reg_max = 2, 4, 16
    no = nc + reg_max * 4
    h0, w0 = 8, 12
    feats_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, no)).astype(np.float32)
        for i in range(3)
    ]
    angle_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, 1)).astype(np.float32)
        for i in range(3)
    ]
    M = 4
    n = B * M
    batch_idx = np.repeat(np.arange(B), M).astype(np.float32)
    cls = rng.integers(0, nc, (n, 1)).astype(np.float32)
    cxy = rng.uniform(0.3, 0.7, (n, 2))
    wh = rng.uniform(0.15, 0.4, (n, 2))
    ang = rng.uniform(-0.6, 0.6, (n, 1))
    rboxes = np.concatenate([cxy, wh, ang], -1).astype(np.float32)

    head = SimpleNamespace(
        stride=torch.tensor([8.0, 16.0, 32.0]), nc=nc, no=no, reg_max=reg_max
    )
    model = SimpleNamespace(
        args=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5),
        model=[head],
        parameters=lambda: iter([torch.nn.Parameter(torch.zeros(1))]),
    )
    ref_fn = v8OBBLoss(model)
    feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np]
    # the reference loss receives the DECODED angle (the OBB head applies
    # (sigmoid - 0.25) * pi before the loss, head.py ``OBB.forward``)
    angle_flat = np.concatenate(
        [a.reshape(B, -1, 1) for a in angle_np], 1
    ).transpose(0, 2, 1)
    angle_t = (torch.from_numpy(angle_flat).sigmoid() - 0.25) * math.pi
    batch_t = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(rboxes),
    }
    ref_total, ref_items = ref_fn((feats_t, angle_t), batch_t)

    batch_j = {
        "gt_labels": jnp.asarray(cls.reshape(B, M).astype(np.int32)),
        "gt_bboxes": jnp.asarray(rboxes.reshape(B, M, 5)),
        "mask_gt": jnp.ones((B, M), bool),
    }
    preds = {
        "det": [jnp.asarray(f) for f in feats_np],
        "angle": [jnp.asarray(a) for a in angle_np],
    }
    total, items = jax.jit(
        lambda p, b: obb_loss(p, b, nc=nc, strides=(8, 16, 32))
    )(preds, batch_j)

    np.testing.assert_allclose(float(total), ref_total.item(), rtol=2e-3)
    ours = np.array([float(items["box"]), float(items["cls"]), float(items["dfl"])])
    np.testing.assert_allclose(ours, ref_items.numpy(), rtol=2e-3, atol=1e-5)
