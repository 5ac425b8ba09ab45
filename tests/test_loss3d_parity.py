"""Parity of the 3D assigner + DDDetectionLoss vs the torch reference."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.train.loss3d import dd_detection_loss

from _oracle import load_reference

NC = 3
MEAN_SIZES = np.array(
    [[1.76255119, 0.66068622, 0.84422524],
     [1.73698127, 0.59706367, 1.76282397],
     [1.52563191, 1.62856739, 3.52588311]],
    np.float32,
)


def _ref_loss(tal_topk, hyp):
    import torch
    from types import SimpleNamespace

    load_reference()
    from ultralytics.utils.loss import DDDetectionLoss

    head = SimpleNamespace(stride=torch.tensor([8.0, 16.0, 32.0]), nc=NC, no=NC + 35)
    dummy = torch.nn.Parameter(torch.zeros(1))
    model = SimpleNamespace(
        args=SimpleNamespace(**hyp),
        model=[head],
        parameters=lambda: iter([dummy]),
    )
    return DDDetectionLoss(model, tal_topk=tal_topk)


HYP = dict(
    loss2d=2.0, cls=1.0, depth=1.0, offset3d=10.0, size3d=1.0, heading=1.0,
    tal_topk=8, tal_alpha=0.5, tal_beta=1.0, tal_gamma=1.0, tal_2d=True,
    tal_3d=True, kps_dist_metric="l1", constrain_anchors=True,
    distillation=False,
)


def test_dd_loss_parity():
    import torch

    rng = np.random.default_rng(7)
    B, M = 2, 5
    h0, w0 = 12, 20  # stride-8 map of a 96x160 input
    imgw, imgh = w0 * 8, h0 * 8
    feats_np = [
        rng.standard_normal((B, h0 // 2**i, w0 // 2**i, NC + 35)).astype(np.float32) * 0.5
        for i in range(3)
    ]
    # plant plausible raw predictions: sizes around e^0 grid cells, dep ~20m
    for f in feats_np:
        f[..., NC + 2 : NC + 4] += 4.0   # s2d in grid units
        f[..., NC + 36 - 2] += 20.0      # dep channel
    n = B * M
    batch_idx = np.repeat(np.arange(B), M).astype(np.float32)
    cls = rng.integers(0, NC, (n, 1)).astype(np.float32)
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
    feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np]
    ref_total, ref_items = ref(feats_t, batch_t, embeddings=None)

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
    total, items = jax.jit(
        lambda f, b: dd_detection_loss(f, b, nc=NC, strides=(8, 16, 32), hyp=HYP, tal_topk=8)
    )([jnp.asarray(f) for f in feats_np], batch_j)

    ours = np.array(
        [float(items[k]) for k in ("box2d", "cls", "dep", "o3d", "s3d", "hd")]
    )
    np.testing.assert_allclose(ours, ref_items.numpy(), rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(float(total), ref_total.item(), rtol=3e-4)


def test_keypoints_parity():
    import torch

    load_reference()
    from ultralytics.utils.keypoint_utils import get_3d_keypoints as ref_kps

    from yolov10_3d_tpu.ops.geometry3d import get_3d_keypoints

    rng = np.random.default_rng(8)
    B, N = 2, 7
    c3d = rng.uniform(100, 500, (B, N, 2)).astype(np.float32)
    dep = rng.uniform(5, 60, (B, N, 1)).astype(np.float32)
    s3d = rng.uniform(0.5, 4.0, (B, N, 3)).astype(np.float32)
    hbin = rng.integers(0, 12, (B, N, 1)).astype(np.float32)
    hres = rng.uniform(-0.2, 0.2, (B, N, 1)).astype(np.float32)
    calib = np.tile([320.0, 180.0, 700.0, 690.0, 0.1, -0.05], (B, 1)).astype(np.float32)

    ref = ref_kps(
        torch.from_numpy(c3d), torch.from_numpy(dep), torch.from_numpy(s3d),
        torch.from_numpy(hbin), torch.from_numpy(hres), torch.from_numpy(calib),
    ).numpy()
    ours = np.asarray(
        get_3d_keypoints(
            jnp.asarray(c3d), jnp.asarray(dep), jnp.asarray(s3d),
            jnp.asarray(hbin), jnp.asarray(hres), jnp.asarray(calib),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
