"""Geometric train-augmentation of instance point sets (segments, keypoints,
OBB corners) — label/pixel alignment in the style of test_device_aug
(reference augment.py:347 RandomPerspective apply_segments/apply_keypoints,
:753 CopyPaste, :973 v8_transforms)."""

import numpy as np
import pytest

try:
    import cv2
except ImportError:
    cv2 = None

pytestmark = pytest.mark.skipif(cv2 is None, reason="cv2 required")


def test_resample_polygon_stays_on_boundary():
    from yolov10_3d_tpu.data.augment import resample_polygon

    rect = np.array([[10, 10], [90, 10], [90, 50], [10, 50]], np.float32)
    out = resample_polygon(rect, 40)
    assert out.shape == (40, 2)
    # every resampled point lies on the rectangle's boundary
    on_edge = (
        (np.isclose(out[:, 0], 10) | np.isclose(out[:, 0], 90))
        & (out[:, 1] >= 10) & (out[:, 1] <= 50)
    ) | (
        (np.isclose(out[:, 1], 10) | np.isclose(out[:, 1], 50))
        & (out[:, 0] >= 10) & (out[:, 0] <= 90)
    )
    assert on_edge.all()
    # extremes preserved
    np.testing.assert_allclose(out.min(0), [10, 10])
    np.testing.assert_allclose(out.max(0), [90, 50])


def test_perspective_segments_track_pixels():
    """Warp an image with one bright instance: the transformed polygon must
    cover the bright pixels (mask/pixel alignment after the warp)."""
    from yolov10_3d_tpu.data.augment import random_perspective, resample_polygon
    from yolov10_3d_tpu.data.utils import polygon2mask

    img = np.zeros((128, 128, 3), np.uint8)
    img[40:80, 30:90] = 255
    labels = np.array([[0, 30, 40, 90, 80]], np.float32)
    poly = resample_polygon(
        np.array([[30, 40], [90, 40], [90, 80], [30, 80]], np.float32), 64
    )[None]
    rng = np.random.default_rng(3)
    out, lab, pts = random_perspective(
        img, labels, rng, degrees=15, translate=0.1, scale=0.3,
        shear=4, points=poly, kind="segments",
    )
    assert len(lab) == 1 and pts.shape == (1, 64, 2)
    mask = polygon2mask((128, 128), pts[0])
    bright = out[..., 0] > 200
    if bright.sum() > 50:
        # >=90% of warped bright pixels inside the warped polygon (border
        # interpolation explains the slack)
        frac = mask[bright].mean()
        assert frac > 0.9, frac
    # box matches the polygon extents
    np.testing.assert_allclose(lab[0, 1:3], pts[0].min(0), atol=1.0)
    np.testing.assert_allclose(lab[0, 3:5], pts[0].max(0), atol=1.0)


def test_perspective_keypoints_visibility_and_alignment():
    from yolov10_3d_tpu.data.augment import random_perspective

    img = np.zeros((128, 128, 3), np.uint8)
    labels = np.array([[0, 20, 20, 100, 100]], np.float32)
    # one keypoint at the box center, one far outside after big translate
    kpts = np.array([[[60, 60, 2.0], [21, 21, 2.0]]], np.float32)
    rng = np.random.default_rng(1)
    out, lab, pts = random_perspective(
        img, labels, rng, translate=0.4, scale=0.0,
        points=kpts, kind="keypoints",
    )
    if len(lab):
        # keypoints move rigidly with the box under pure translation
        dx = lab[0, 1] - 20 if lab[0, 1] > 0 else None  # clipped -> skip
        inside = (
            (pts[0, :, 0] >= 0) & (pts[0, :, 0] <= 128)
            & (pts[0, :, 1] >= 0) & (pts[0, :, 1] <= 128)
        )
        # out-of-frame keypoints lose visibility, in-frame keep it
        assert np.all(pts[0][~inside][:, 2] == 0.0)
        assert np.all(pts[0][inside][:, 2] == 2.0)


def test_flip_lr_keypoints_chiral_swap():
    from yolov10_3d_tpu.data.augment import random_flip_lr

    img = np.zeros((64, 64, 3), np.uint8)
    labels = np.array([[0, 10, 10, 30, 30]], np.float32)
    # kpt0 = "left" at x=12, kpt1 = "right" at x=28
    kpts = np.array([[[12, 20, 2.0], [28, 22, 2.0]]], np.float32)
    rng = np.random.default_rng(0)  # first random() < 0.5 -> flips with p=1
    img2, lab, pts, flipped = random_flip_lr(
        img, labels.copy(), rng, p=1.0, points=kpts, kind="keypoints",
        flip_idx=(1, 0),
    )
    assert flipped
    # row 0 now holds the mirrored former "right" point
    np.testing.assert_allclose(pts[0, 0], [64 - 28, 22, 2.0])
    np.testing.assert_allclose(pts[0, 1], [64 - 12, 20, 2.0])
    np.testing.assert_allclose(lab[0, 1:], [64 - 30, 10, 64 - 10, 30])


def test_mosaic4_points_follow_boxes():
    from yolov10_3d_tpu.data.augment import mosaic4

    rng = np.random.default_rng(0)
    items = []
    for _ in range(4):
        img = np.zeros((64, 64, 3), np.uint8)
        labels = np.array([[0, 16, 16, 48, 48]], np.float32)
        corners = np.array([[[16, 16], [48, 16], [48, 48], [16, 48]]], np.float32)
        items.append((img, labels, corners))
    canvas, labels, points = mosaic4(items, (64, 64), rng)
    assert canvas.shape == (128, 128, 3)
    assert len(labels) == len(points)
    for lab, quad in zip(labels, points):
        # corner extents == box (up to the canvas clip applied to boxes)
        assert quad[:, 0].min() <= lab[1] + 1e-3 and quad[:, 0].max() >= lab[3] - 1e-3
        assert quad[:, 1].min() <= lab[2] + 1e-3 and quad[:, 1].max() >= lab[4] - 1e-3


def _seg_tree(tmp_path, n=4):
    img_dir = tmp_path / "train" / "images"
    lbl_dir = tmp_path / "train" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(n):
        img = np.zeros((96, 96, 3), np.uint8)
        img[24:72, 24:72] = 255
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        (lbl_dir / f"{i}.txt").write_text("0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    return img_dir


def test_seg_dataset_train_aug_mask_box_alignment(tmp_path):
    from yolov10_3d_tpu.data.dataset_tasks import SegmentationEvalDataset

    ds = SegmentationEvalDataset(
        _seg_tree(tmp_path), imgsz=96, augment=True,
        hyp={"mosaic": 1.0, "fliplr": 0.5, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0},
        seed=0,
    )
    hits = 0
    for i in range(len(ds)):
        out = ds[i]
        assert out["gt_masks"].shape == (ds.max_boxes, 24, 24)
        for j in np.nonzero(out["mask_gt"])[0]:
            m = out["gt_masks"][j]
            if m.sum() < 4:
                continue
            ys, xs = np.nonzero(m)
            # mask extents within the (normalized-xywh) box at mask scale
            cx, cy, bw, bh = out["gt_bboxes"][j] * np.array([24, 24, 24, 24])
            assert xs.min() >= cx - bw / 2 - 2 and xs.max() <= cx + bw / 2 + 2
            assert ys.min() >= cy - bh / 2 - 2 and ys.max() <= cy + bh / 2 + 2
            hits += 1
    assert hits >= 2  # augmentation kept visible instances


def _pose_tree(tmp_path, n=4, nk=4):
    img_dir = tmp_path / "train" / "images"
    lbl_dir = tmp_path / "train" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    # keypoints = the four box corners (alignment is then checkable)
    kp = "0.3 0.3 2 0.7 0.3 2 0.7 0.7 2 0.3 0.7 2"
    for i in range(n):
        cv2.imwrite(
            str(img_dir / f"{i}.jpg"),
            np.random.default_rng(i).integers(0, 255, (96, 96, 3), np.uint8),
        )
        (lbl_dir / f"{i}.txt").write_text(f"0 0.5 0.5 0.4 0.4 {kp}\n")
    return img_dir


def test_pose_dataset_train_aug_kpts_inside_box(tmp_path):
    from yolov10_3d_tpu.data.dataset_tasks import PoseEvalDataset

    ds = PoseEvalDataset(
        _pose_tree(tmp_path), imgsz=96, augment=True, kpt_shape=(4, 3),
        flip_idx=(1, 0, 3, 2),
        hyp={"mosaic": 1.0, "fliplr": 0.5, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0},
        seed=1,
    )
    hits = 0
    for i in range(len(ds)):
        out = ds[i]
        assert out["gt_kpts"].shape == (ds.max_boxes, 4, 3)
        for j in np.nonzero(out["mask_gt"])[0]:
            k = out["gt_kpts"][j]
            vis = k[:, 2] > 0
            if not vis.any():
                continue
            cx, cy, bw, bh = out["gt_bboxes"][j] * 96
            # visible corner keypoints stay inside the (affine-warped) box
            assert (k[vis, 0] >= cx - bw / 2 - 2).all() and (k[vis, 0] <= cx + bw / 2 + 2).all()
            assert (k[vis, 1] >= cy - bh / 2 - 2).all() and (k[vis, 1] <= cy + bh / 2 + 2).all()
            hits += 1
    assert hits >= 2


def _obb_tree(tmp_path, n=4):
    img_dir = tmp_path / "train" / "images"
    lbl_dir = tmp_path / "train" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(n):
        cv2.imwrite(
            str(img_dir / f"{i}.jpg"),
            np.random.default_rng(i).integers(0, 255, (96, 96, 3), np.uint8),
        )
        # axis-aligned 0.4x0.2 rect
        (lbl_dir / f"{i}.txt").write_text("0 0.3 0.4 0.7 0.4 0.7 0.6 0.3 0.6\n")
    return img_dir


def test_obb_dataset_train_aug_xywhr_refit(tmp_path):
    from yolov10_3d_tpu.data.dataset_tasks import OBBEvalDataset

    ds = OBBEvalDataset(
        _obb_tree(tmp_path), imgsz=96, augment=True,
        hyp={"mosaic": 1.0, "degrees": 20.0, "fliplr": 0.5,
             "hsv_h": 0, "hsv_s": 0, "hsv_v": 0},
        seed=2,
    )
    hits = 0
    for i in range(len(ds)):
        out = ds[i]
        assert out["gt_bboxes"].shape == (ds.max_boxes, 5)
        for j in np.nonzero(out["mask_gt"])[0]:
            cx, cy, w, h, ang = out["gt_bboxes"][j]
            if w <= 0 or h <= 0:
                continue
            # corners stay unclipped (rotated-rect geometry), so a partially
            # out-of-frame instance's center may sit slightly outside [0,1]
            assert -0.25 <= cx <= 1.25 and -0.25 <= cy <= 1.25
            assert np.isfinite(ang)
            # a rotated rect stays a rect under affine: aspect ~ 2:1 up to
            # the warp's shear-free similarity part
            hits += 1
    assert hits >= 2


def test_detect_pipeline_unchanged_without_points(tmp_path):
    """Plain detect datasets still return the 2-tuple-driven batch (points
    channel dormant)."""
    from yolov10_3d_tpu.data.dataset import YOLODataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i in range(4):
        cv2.imwrite(
            str(img_dir / f"{i}.jpg"),
            np.random.default_rng(i).integers(0, 255, (64, 64, 3), np.uint8),
        )
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    ds = YOLODataset(img_dir, imgsz=64, augment=True, hyp={"mosaic": 1.0}, seed=0)
    out = ds[0]
    assert set(out) == {"img", "gt_labels", "gt_bboxes", "mask_gt", "im_id"}
    assert out["img"].shape == (64, 64, 3)


def test_empty_mosaic_keeps_points_tail_dims():
    """All-empty tiles must produce (0, P, D) with the task's trailing dims —
    a (0,1,2) placeholder crashed pose formatting and mixup concat."""
    from yolov10_3d_tpu.data.augment import mixup, mosaic4

    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.uint8)
    empty = (img, np.zeros((0, 5), np.float32), np.zeros((0, 4, 3), np.float32))
    canvas, labels, points = mosaic4([empty] * 4, (64, 64), rng)
    assert points.shape == (0, 4, 3)
    # mixup with a non-empty partner concatenates cleanly
    full = (
        img,
        np.array([[0, 10, 10, 30, 30]], np.float32),
        np.zeros((1, 4, 3), np.float32),
    )
    _, labels2, points2 = mosaic4([full] * 4, (64, 64), rng)
    _, lab3, pts3 = mixup(canvas, labels, canvas, labels2, rng, points, points2)
    assert pts3.shape[1:] == (4, 3) and len(pts3) == len(lab3)


def test_pose_dataset_empty_image_train_aug(tmp_path):
    """A pose dataset whose images have no labels survives the augment path."""
    from yolov10_3d_tpu.data.dataset_tasks import PoseEvalDataset

    img_dir = tmp_path / "train" / "images"
    lbl_dir = tmp_path / "train" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(
            str(img_dir / f"{i}.jpg"),
            np.random.default_rng(i).integers(0, 255, (64, 64, 3), np.uint8),
        )
        (lbl_dir / f"{i}.txt").write_text("")  # background-only
    ds = PoseEvalDataset(
        img_dir, imgsz=64, augment=True, kpt_shape=(4, 3),
        hyp={"mosaic": 1.0}, seed=0,
    )
    out = ds[0]
    assert out["gt_kpts"].shape == (ds.max_boxes, 4, 3)
    assert not out["mask_gt"].any()
