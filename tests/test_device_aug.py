"""Device-side training augmentation (ops/device_aug.py): label-pixel
alignment through mosaic + crop + flip, batch contract, and the e2e
DataLoader(device_aug) -> fused train step path (BASELINE.json north star)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _solid_tiles(B=2, T=4, H=64, W=64, M=5):
    """Tiles with one solid colored box each; color encodes (b, t)."""
    rng = np.random.default_rng(0)
    tiles = np.full((B, T, H, W, 3), 20, np.uint8)
    labels = np.zeros((B, T, M, 5), np.float32)
    mask = np.zeros((B, T, M), bool)
    for b in range(B):
        for t in range(T):
            x1, y1 = rng.integers(4, W - 30), rng.integers(4, H - 30)
            w, h = rng.integers(16, 24), rng.integers(16, 24)
            color = 50 + 40 * t
            tiles[b, t, y1 : y1 + h, x1 : x1 + w] = (color, 255 - color, color)
            labels[b, t, 0] = (t, x1, y1, x1 + w, y1 + h)
            mask[b, t, 0] = True
    return tiles, labels, mask


@pytest.mark.parametrize("fliplr", [0.0, 1.0])
def test_device_aug_label_pixel_alignment(fliplr):
    """Every surviving box's center pixel must show its OWN tile's color —
    across many keys, and boxes from several different tiles must survive
    (a misaligned mosaic can pass a weaker check by clipping partner-tile
    boxes away entirely; caught in review)."""
    from yolov10_3d_tpu.ops.device_aug import device_train_augment

    tiles, labels, mask = _solid_tiles()
    seen_tiles = set()
    n_checked = 0
    for seed in range(6):
        out = device_train_augment(
            jnp.asarray(tiles), jnp.asarray(labels), jnp.asarray(mask),
            jax.random.PRNGKey(seed), out_hw=(64, 64), crop_hw=(64, 64),
            max_boxes=8, hsv_gains=(0.0, 0.0, 0.0), fliplr=fliplr,
        )
        img = np.asarray(out["img"])
        assert img.shape == (2, 64, 64, 3) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        gt = np.asarray(out["gt_bboxes"])
        gl = np.asarray(out["gt_labels"])
        m = np.asarray(out["mask_gt"])
        assert m.shape == (2, 8)
        for b in range(2):
            for k in np.nonzero(m[b])[0]:
                cx, cy, w, h = gt[b, k]
                assert 0 < w <= 1 and 0 < h <= 1
                px = int(np.clip(cx * 64, 0, 63))
                py = int(np.clip(cy * 64, 0, 63))
                t = int(gl[b, k])
                expect = (50 + 40 * t) / 255.0
                # center pixel of every surviving box shows its tile's color
                # (exact: HSV gains are zeroed, bilinear resize is identity)
                assert abs(float(img[b, py, px, 0]) - expect) < 0.03, (b, k, t)
                seen_tiles.add(t)
                n_checked += 1
    # the mosaic genuinely mixes tiles: boxes from >=3 distinct tiles survive
    assert len(seen_tiles) >= 3, seen_tiles
    assert n_checked >= 10


def test_device_aug_valid_boxes_compacted():
    from yolov10_3d_tpu.ops.device_aug import device_train_augment

    tiles, labels, mask = _solid_tiles()
    out = device_train_augment(
        jnp.asarray(tiles), jnp.asarray(labels), jnp.asarray(mask),
        jax.random.PRNGKey(0), out_hw=(64, 64), crop_hw=(64, 64), max_boxes=8,
    )
    m = np.asarray(out["mask_gt"])
    # valid entries are compacted to the front
    for b in range(m.shape[0]):
        n = int(m[b].sum())
        assert m[b, :n].all() and not m[b, n:].any()
    # padded boxes are zeroed
    gt = np.asarray(out["gt_bboxes"])
    assert (gt[~m] == 0).all()


def test_device_aug_e2e_training(tmp_path):
    """DataLoader(device_aug) tiles -> fused augment+train step, 1 epoch."""
    import cv2

    from yolov10_3d_tpu import YOLOv10

    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        img = np.full((96, 96, 3), 30, np.uint8)
        img[20:60, 20:60] = (200, 60, 60)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), img[..., ::-1])
        (root / "labels" / "train" / f"{i}.txt").write_text("0 0.41 0.41 0.42 0.42\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: red\n"
    )
    model = YOLOv10("yolov10n.yaml")
    state = model.train(
        data=str(root / "data.yaml"), epochs=1, imgsz=64, batch=8, workers=2,
        device_aug=True, val=False, amp=False, warmup_epochs=0.0,
        save_dir=str(tmp_path / "run"), close_mosaic=0,
    )
    assert state is not None and int(state.step) == 1
    import csv

    with open(tmp_path / "run" / "results.csv") as f:
        row = list(csv.DictReader(f))[0]
    assert np.isfinite(float(row["loss"]))
