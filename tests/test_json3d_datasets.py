"""Waymo/Omni3D JSON datasets produce valid padded batches."""

import json
import math
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def waymo_root(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    root = tmp_path_factory.mktemp("waymo")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    P2 = [[2000.0, 0, 940.0, 0], [0, 2000.0, 640.0, 0], [0, 0, 1, 0]]
    images, annotations = [], []
    aid = 0
    for i in range(3):
        img = rng.integers(0, 255, (1280, 1920, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"images/{i}.jpg", "calib": P2})
        for j in range(2):
            x, z = float(rng.uniform(-5, 5)), float(rng.uniform(15, 40))
            u = 2000 * x / z + 940
            v = 640.0
            w2d, h2d = 2000 * 4.8 / z, 2000 * 1.8 / z
            annotations.append(
                {
                    "id": aid, "image_id": i, "category_id": 1,
                    "bbox": [u - w2d / 2, v - h2d / 2, w2d, h2d],
                    "translation": [x, 1.2, z],
                    "dim": [1.8, 2.1, 4.8],
                    "rotation_y": float(rng.uniform(-math.pi, math.pi)),
                    "num_lidar": 30,
                }
            )
            aid += 1
    (root / "train.json").write_text(json.dumps({"images": images, "annotations": annotations}))
    return root / "train.json"


def test_waymo_dataset(waymo_root):
    from yolov10_3d_tpu.data.waymo import WaymoDataset

    ds = WaymoDataset(waymo_root, split="val")
    assert len(ds) == 3
    item = ds[0]
    assert item["img"].shape == (640, 960, 3)
    n = int(item["mask_gt"].sum())
    assert n >= 1
    assert (item["gt_depth"][:n] > 1).all()


@pytest.fixture(scope="module")
def omni_root(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    root = tmp_path_factory.mktemp("omni")
    (root / "images").mkdir()
    rng = np.random.default_rng(1)
    K = [[1000.0, 0, 800.0], [0, 1000.0, 450.0], [0, 0, 1]]
    images, annotations = [], []
    for i in range(2):
        img = rng.integers(0, 255, (900, 1600, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        images.append({"id": i, "file_path": f"images/{i}.jpg", "K": K})
        x, z = 1.0, 25.0
        u = 1000 * x / z + 800
        annotations.append(
            {
                "image_id": i, "category_id": 5,
                "bbox2D_proj": [u - 80, 380, u + 80, 500],
                "dimensions": [1.6, 1.5, 3.9],  # w, h, l
                "center_cam": [x, 1.0, z],
                "R_cam": np.eye(3).tolist(),
                "lidar_pts": 50, "behind_camera": False, "visibility": 0.9,
                "truncation": 0.0, "segmentation_pts": 40, "depth_error": 0.1,
                "valid3D": True,
            }
        )
    cats = [{"id": 5, "name": "car"}]
    (root / "val.json").write_text(
        json.dumps({"images": images, "annotations": annotations, "categories": cats})
    )
    return root / "val.json"


def test_omni3d_dataset(omni_root):
    from yolov10_3d_tpu.data.omni3d import Omni3Dataset

    ds = Omni3Dataset(omni_root, split="val")
    assert len(ds) == 2
    item = ds[0]
    assert item["img"].shape == (640, 960, 3)
    assert int(item["mask_gt"].sum()) == 1
    assert abs(float(item["gt_depth"][0]) - 25.0) < 1e-3


def test_waymo_get_stats_fitness_is_waymo_protocol(waymo_root, tmp_path):
    """Fitness from WaymoDataset.get_stats is the Waymo-protocol
    VEHICLE_L2/AP (reference waymo.py:408-426 parses exactly this cell of
    the official tool's table), with the KITTI-protocol AP40 kept as a
    cross-check attribute. Perfect GT-echo predictions -> AP ~= 1.0."""
    from yolov10_3d_tpu.data.waymo import WaymoDataset

    ds = WaymoDataset(waymo_root, split="val")
    results = {}
    for item in range(len(ds)):
        idx = ds.sample_id(item)
        rows = []
        for o in ds.get_label(idx):
            rows.append([
                0.0,  # cls id (Car)
                0.0,  # alpha
                o.box2d[0], o.box2d[1], o.box2d[2], o.box2d[3],
                o.h, o.w, o.l,
                o.pos[0], o.pos[1], o.pos[2], o.ry,
                0.95,  # score
            ])
        results[f"{idx:06d}.txt"] = rows
    fitness = ds.get_stats(results, str(tmp_path))
    assert fitness == pytest.approx(ds.waymo_metrics["VEHICLE_L2/AP"])
    assert fitness == pytest.approx(1.0, abs=0.02), ds.waymo_metrics
    # the KITTI-protocol cross-check is still computed (percent units; its
    # moderate-difficulty box-height filters discard most of this tiny
    # fixture, so only finiteness is asserted — the fitness above is the
    # protocol-correct number)
    assert np.isfinite(ds.kitti_protocol_ap)
