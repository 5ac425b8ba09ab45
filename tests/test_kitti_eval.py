"""KITTI evaluator correctness: rotated IoU vs brute force, AP protocol on
synthetic scenes, and bbox-metric parity vs the reference's CPU path."""

import math
from pathlib import Path

import numpy as np
import pytest

from yolov10_3d_tpu.eval.kitti_eval import (
    bev_iou, d3_box_overlap, eval_from_scratch, image_box_iou, rect_corners,
)


def brute_force_iou(b1, b2, res=400):
    """Rasterized rotated-rect IoU for one pair (cx, cz, l, w, ry)."""
    c1 = rect_corners(b1[None])[0]
    c2 = rect_corners(b2[None])[0]
    lo = np.minimum(c1.min(0), c2.min(0)) - 0.1
    hi = np.maximum(c1.max(0), c2.max(0)) + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    zs = np.linspace(lo[1], hi[1], res)
    gx, gz = np.meshgrid(xs, zs)
    pts = np.stack([gx.ravel(), gz.ravel()], -1)

    def inside(c):
        a = c
        b = np.roll(c, -1, axis=0)
        e = b - a
        rel = pts[:, None, :] - a[None]
        cr = e[None, :, 0] * rel[..., 1] - e[None, :, 1] * rel[..., 0]
        return (cr >= 0).all(-1) | (cr <= 0).all(-1)

    m1, m2 = inside(c1), inside(c2)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    return inter / union


def test_rotated_iou_vs_bruteforce():
    rng = np.random.default_rng(0)
    boxes1 = np.stack(
        [rng.uniform(-5, 5, 12), rng.uniform(10, 30, 12),
         rng.uniform(2, 5, 12), rng.uniform(1, 3, 12),
         rng.uniform(-math.pi, math.pi, 12)], -1,
    )
    boxes2 = boxes1 + rng.normal(0, 1.0, boxes1.shape) * [1, 1, 0.3, 0.3, 0.3]
    boxes2[:, 2:4] = np.abs(boxes2[:, 2:4]) + 0.5
    iou = bev_iou(boxes1, boxes2)
    for i in range(len(boxes1)):
        ref = brute_force_iou(boxes1[i], boxes2[i])
        assert abs(iou[i, i] - ref) < 0.02, (i, iou[i, i], ref)


def test_rotated_iou_axis_aligned_exact():
    # ry=0 boxes: must equal plain IoU exactly
    b1 = np.array([[0.0, 10.0, 4.0, 2.0, 0.0]])
    b2 = np.array([[1.0, 10.5, 4.0, 2.0, 0.0]])
    # axis-aligned rects: x in [-2,2] vs [-1,3] -> inter_x 3; z in [9,11] vs [9.5,11.5] -> 1.5
    inter = 3 * 1.5
    expect = inter / (8 + 8 - inter)
    assert abs(bev_iou(b1, b2)[0, 0] - expect) < 1e-6
    # identical box rotated arbitrarily -> IoU 1
    b = np.array([[2.0, 15.0, 3.9, 1.6, 0.7]])
    assert abs(bev_iou(b, b)[0, 0] - 1.0) < 1e-6


def _write_kitti_scene(tmp, perfect=True, n_imgs=16):
    # >= 41 valid GTs so the 41 recall sample points are all reachable
    # (with fewer GTs the official protocol itself caps AP below 100)
    gt_dir = tmp / "label_2"
    det_dir = tmp / "preds"
    gt_dir.mkdir(parents=True, exist_ok=True)
    det_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(n_imgs):
        gt_lines, det_lines = [], []
        for j in range(3):
            x = float(rng.uniform(-10, 10))
            z = float(rng.uniform(10, 40))
            ry = float(rng.uniform(-math.pi, math.pi))
            h, w, l = 1.5, 1.6, 3.9
            # a tall enough 2D box to count as "easy"
            x1, y1 = 100 + j * 200, 150
            x2, y2 = x1 + 80, y1 + 60
            gt_lines.append(
                f"Car 0.0 0 0.0 {x1} {y1} {x2} {y2} {h} {w} {l} {x} {1.6} {z} {ry}"
            )
            if perfect or j != 0:
                score = float(rng.uniform(0.3, 0.99))
                det_lines.append(
                    f"Car 0.0 0 0.0 {x1} {y1} {x2} {y2} {h} {w} {l} {x} {1.6} {z} {ry} {score}"
                )
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gt_lines) + "\n")
        (det_dir / f"{i:06d}.txt").write_text("\n".join(det_lines) + "\n")
    return gt_dir, det_dir


def test_ap_perfect_detections(tmp_path):
    gt_dir, det_dir = _write_kitti_scene(tmp_path, perfect=True)
    res = eval_from_scratch(str(gt_dir), str(det_dir), ap_mode=40, classes=["car"])
    for key in ("bbox@0.70", "bev@0.70", "3d@0.70"):
        for v in res[key]:
            assert v > 97.0, (key, res[key])


def test_ap_missing_detections(tmp_path):
    gt_dir, det_dir = _write_kitti_scene(tmp_path, perfect=False)
    res = eval_from_scratch(str(gt_dir), str(det_dir), ap_mode=40, classes=["car"])
    # 2/3 recall ceiling -> AP noticeably below 100 and above 0
    assert 30.0 < res["3d@0.70"][0] < 80.0, res


def test_bbox_ap_parity_with_reference(tmp_path):
    """The reference's bbox-metric path is CPU-runnable (numba stubs) — compare
    the full AP40 bbox numbers."""
    from _oracle import load_reference

    load_reference()
    from ultralytics.data.datasets import kitti_eval as ref_eval

    gt_dir, det_dir = _write_kitti_scene(tmp_path, perfect=False, n_imgs=6)

    # build annos exactly like the reference loader (eval_from_scrach body)
    import os

    all_gt, all_det = [], []
    for f in sorted(os.listdir(det_dir)):
        gt_f = np.loadtxt(gt_dir / f, dtype=str).reshape(-1, 15)
        det_f = np.loadtxt(det_dir / f, dtype=str).reshape(-1, 16)
        gt = {
            "bbox": gt_f[:, 4:8].astype(np.float32),
            "alpha": gt_f[:, 3].astype(np.float32),
            "occluded": gt_f[:, 2].astype(np.float32),
            "truncated": gt_f[:, 1].astype(np.float32),
            "name": gt_f[:, 0],
            "location": gt_f[:, 11:14].astype(np.float32),
            "dimensions": gt_f[:, [10, 8, 9]].astype(np.float32),
            "rotation_y": gt_f[:, 14].astype(np.float32),
        }
        det = {k: v for k, v in {
            "bbox": det_f[:, 4:8].astype(np.float32),
            "alpha": det_f[:, 3].astype(np.float32),
            "occluded": det_f[:, 2].astype(np.float32),
            "truncated": det_f[:, 1].astype(np.float32),
            "name": det_f[:, 0],
            "location": det_f[:, 11:14].astype(np.float32),
            "dimensions": det_f[:, [10, 8, 9]].astype(np.float32),
            "rotation_y": det_f[:, 14].astype(np.float32),
            "score": det_f[:, 15].astype(np.float32),
        }.items()}
        all_gt.append(gt)
        all_det.append(det)

    ref_eval.AP_mode = 40
    rets = ref_eval.eval_class_v3(
        all_gt, all_det, current_classes=[0], difficultys=[0, 1, 2], metric=0,
        min_overlaps=np.array([[[0.7]], [[0.7]], [[0.7]]]), num_parts=1,
    )
    # rets["precision"] shape (n_class, n_difficulty, n_overlap, 41)
    ref_prec = rets["precision"][0, :, 0]
    ref_ap = ref_prec[:, 1:41].sum(-1) / 40 * 100

    ours = eval_from_scratch(str(gt_dir), str(det_dir), ap_mode=40, classes=["car"])
    np.testing.assert_allclose(np.array(ours["bbox@0.70"]), ref_ap, atol=0.3)


def test_native_cpp_iou_matches_numpy():
    """The C++ ctypes kernel (native/kitti_iou.cc) must match the vectorized
    numpy rotated IoU."""
    from yolov10_3d_tpu.native import get_lib, rotated_iou, iou_3d
    from yolov10_3d_tpu.eval.kitti_eval import rotated_intersection_area

    if get_lib() is None:
        import pytest

        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(5)
    b1 = np.stack(
        [rng.uniform(-10, 10, 20), rng.uniform(5, 50, 20),
         rng.uniform(1, 5, 20), rng.uniform(1, 3, 20),
         rng.uniform(-math.pi, math.pi, 20)], -1,
    ).astype(np.float32)
    b2 = (b1 + rng.normal(0, 0.8, b1.shape) * [1, 1, 0.2, 0.2, 0.4]).astype(np.float32)
    b2[:, 2:4] = np.abs(b2[:, 2:4]) + 0.3
    native = rotated_iou(b1, b2)
    inter = rotated_intersection_area(b1.astype(np.float64), b2.astype(np.float64))
    a1 = (b1[:, 2] * b1[:, 3]).astype(np.float64)[:, None]
    a2 = (b2[:, 2] * b2[:, 3]).astype(np.float64)[None, :]
    ref = inter / np.maximum(a1 + a2 - inter, 1e-12)
    np.testing.assert_allclose(native, ref, atol=2e-4)

    # 3D kernel
    g = np.concatenate(
        [b1[:, :1], rng.uniform(1, 2, (20, 1)).astype(np.float32), b1[:, 1:2],
         b1[:, 2:3], rng.uniform(1, 2, (20, 1)).astype(np.float32), b1[:, 3:4],
         b1[:, 4:5]], -1,
    )
    out3d = iou_3d(g, g)
    np.testing.assert_allclose(np.diag(out3d), np.ones(20), atol=1e-4)


def _write_noisy_scene(tmp, n_imgs=10):
    """Detections with jittered 3D pose so the rotated/3D IoU actually
    discriminates (some above, some below the 0.7/0.5 thresholds)."""
    gt_dir = tmp / "label_2n"
    det_dir = tmp / "predsn"
    gt_dir.mkdir(parents=True, exist_ok=True)
    det_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n_imgs):
        gt_lines, det_lines = [], []
        for j in range(5):
            x = float(rng.uniform(-10, 10))
            z = float(rng.uniform(10, 40))
            ry = float(rng.uniform(-math.pi, math.pi))
            h, w, l = 1.5, 1.6, 3.9
            x1, y1 = 80 + j * 150, 150
            x2, y2 = x1 + 80, y1 + 60
            gt_lines.append(
                f"Car 0.0 0 0.0 {x1} {y1} {x2} {y2} {h} {w} {l} {x} {1.6} {z} {ry}"
            )
            # jittered detection (sometimes large jitter -> miss)
            jit = rng.uniform(0.02, 0.9)
            score = float(rng.uniform(0.3, 0.99))
            det_lines.append(
                f"Car 0.0 0 0.0 {x1 + jit * 20:.2f} {y1} {x2 + jit * 20:.2f} {y2} "
                f"{h} {w} {l} {x + jit:.3f} {1.6} {z + jit:.3f} {ry + jit * 0.3:.4f} {score}"
            )
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gt_lines) + "\n")
        (det_dir / f"{i:06d}.txt").write_text("\n".join(det_lines) + "\n")
    return gt_dir, det_dir


def test_bev_and_3d_ap_parity_with_reference(tmp_path, monkeypatch):
    """The reference's bev/3d paths need its numba-CUDA rotated IoU; inject
    our (brute-force- and C++-validated) rotated intersection in its place and
    compare the FULL reference statistics pipeline on the bev and 3d metrics."""
    from _oracle import load_reference

    load_reference()
    from ultralytics.data.datasets import kitti_eval as ref_eval

    from yolov10_3d_tpu.eval.kitti_eval import bev_iou, rotated_intersection_area

    def fake_rotate_iou(boxes, qboxes, criterion=-1, device_id=0):
        boxes = np.asarray(boxes, np.float64)
        qboxes = np.asarray(qboxes, np.float64)
        if len(boxes) == 0 or len(qboxes) == 0:
            return np.zeros((len(boxes), len(qboxes)), np.float32)
        if criterion in (-1, 0, 1):
            return bev_iou(boxes, qboxes, criterion).astype(np.float32)
        return rotated_intersection_area(boxes, qboxes).astype(np.float32)

    monkeypatch.setattr(ref_eval, "rotate_iou_gpu_eval", fake_rotate_iou)

    gt_dir, det_dir = _write_noisy_scene(tmp_path)

    import os
    all_gt, all_det = [], []
    for f in sorted(os.listdir(det_dir)):
        gt_f = np.loadtxt(gt_dir / f, dtype=str).reshape(-1, 15)
        det_f = np.loadtxt(det_dir / f, dtype=str).reshape(-1, 16)
        def parse(a, score=False):
            d = {
                "bbox": a[:, 4:8].astype(np.float32),
                "alpha": a[:, 3].astype(np.float32),
                "occluded": a[:, 2].astype(np.float32),
                "truncated": a[:, 1].astype(np.float32),
                "name": a[:, 0],
                "location": a[:, 11:14].astype(np.float32),
                "dimensions": a[:, [10, 8, 9]].astype(np.float32),
                "rotation_y": a[:, 14].astype(np.float32),
            }
            if score:
                d["score"] = a[:, 15].astype(np.float32)
            return d
        all_gt.append(parse(gt_f))
        all_det.append(parse(det_f, score=True))

    ours = eval_from_scratch(str(gt_dir), str(det_dir), ap_mode=40, classes=["car"])
    ref_eval.AP_mode = 40
    for metric, key, ov in ((1, "bev@0.70", 0.7), (2, "3d@0.70", 0.7)):
        rets = ref_eval.eval_class_v3(
            all_gt, all_det, current_classes=[0], difficultys=[0, 1, 2],
            metric=metric, min_overlaps=np.full((1, 3, 1), ov),
            num_parts=1,
        )
        ref_ap = rets["precision"][0, :, 0][:, 1:41].sum(-1) / 40 * 100
        np.testing.assert_allclose(np.array(ours[key]), ref_ap, atol=0.5)
