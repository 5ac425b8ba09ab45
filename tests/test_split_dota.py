"""DOTA tiling (data/split_dota.py vs reference data/split_dota.py)."""

from pathlib import Path

import numpy as np
import pytest


def test_get_windows_cover_and_snap():
    from yolov10_3d_tpu.data.split_dota import get_windows

    w = get_windows((1500, 2000), crop_sizes=(1024,), gaps=(200,))
    assert (w[:, 2] - w[:, 0] == 1024).all() and (w[:, 3] - w[:, 1] == 1024).all()
    # last windows snapped inside the image
    assert w[:, 2].max() == 2000 and w[:, 3].max() == 1500
    # small image -> single window kept despite low area ratio
    w2 = get_windows((300, 300), crop_sizes=(1024,), gaps=(200,))
    assert len(w2) == 1


def test_bbox_iof_inside_outside():
    from yolov10_3d_tpu.data.split_dota import bbox_iof

    poly = np.array([[100, 100, 200, 100, 200, 200, 100, 200]], np.float64)
    wins = np.array([[0, 0, 512, 512], [300, 300, 800, 800]], np.float64)
    iof = bbox_iof(poly, wins)
    assert iof[0, 0] == pytest.approx(1.0, rel=1e-3)
    assert iof[0, 1] == 0.0


def test_split_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from yolov10_3d_tpu.data.split_dota import split_trainval

    root = tmp_path / "dota"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    img = np.zeros((1200, 1600, 3), np.uint8)
    img[100:200, 100:300] = 255
    cv2.imwrite(str(root / "images" / "train" / "P0001.jpg"), img)
    # one polygon label fully inside the top-left window (normalized coords)
    (root / "labels" / "train" / "P0001.txt").write_text(
        "0 0.0625 0.0833 0.1875 0.0833 0.1875 0.1667 0.0625 0.1667\n"
    )
    out = tmp_path / "out"
    n = split_trainval(root, out, crop_size=1024, gap=200)
    assert n >= 4
    crops = list((out / "images" / "train").glob("*.jpg"))
    assert len(crops) == n
    # the label landed in the window containing it, shifted+renormalized
    lb = (out / "labels" / "train" / "P0001__1024__0___0.txt").read_text().split()
    assert lb[0] == "0"
    xs = np.array([float(v) for v in lb[1::2]])
    assert xs.min() == pytest.approx(100 / 1024, rel=1e-2)
