"""End-to-end integration: synthetic 8-image dataset -> train -> val -> predict
-> export (the reference's coco8-at-imgsz-32 test strategy, SURVEY.md §4)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """8 images with solid rectangles of 2 classes + YOLO labels."""
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    root = tmp_path_factory.mktemp("tinyset")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((96, 96, 3), 30, np.uint8)
            lines = []
            for _ in range(rng.integers(1, 3)):
                c = int(rng.integers(0, 2))
                w, h = rng.integers(20, 40, 2)
                x1 = int(rng.integers(0, 96 - w))
                y1 = int(rng.integers(0, 96 - h))
                color = (220, 40, 40) if c == 0 else (40, 220, 40)
                img[y1 : y1 + h, x1 : x1 + w] = color
                cx, cy = (x1 + w / 2) / 96, (y1 + h / 2) / 96
                lines.append(f"{c} {cx:.6f} {cy:.6f} {w/96:.6f} {h/96:.6f}")
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img[..., ::-1])
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(lines))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: red\n  1: green\n"
    )
    return yaml_path


def test_train_val_predict_export(tiny_dataset, tmp_path):
    from yolov10_3d_tpu import YOLOv10

    model = YOLOv10("yolov10n.yaml")
    info = model.info()
    assert info["nc"] == 80 and info["parameters"] > 2e6

    # facade callback registration (reference Model.add_callback)
    fired = []
    model.add_callback("on_fit_epoch_end", lambda tr: fired.append(tr.epoch))

    state = model.train(
        data=str(tiny_dataset),
        epochs=2,
        imgsz=64,
        batch=8,
        workers=2,
        warmup_epochs=0.0,
        val_period=1,
        close_mosaic=0,
        mosaic=0.0,
        mixup=0.0,
        save_dir=str(tmp_path / "run"),
        patience=100,
        amp=False,
    )
    assert state is not None
    assert fired == [0, 1]  # facade-registered callback fired every epoch
    assert (tmp_path / "run" / "weights" / "last.ckpt").exists()
    assert (tmp_path / "run" / "results.csv").exists()

    # reload from checkpoint
    model2 = YOLOv10(str(tmp_path / "run" / "weights" / "last.ckpt"))
    assert model2.spec.nc == 2
    res = model2.val(data=str(tiny_dataset), imgsz=64, batch=4)
    assert 0.0 <= res["mAP50-95"] <= 1.0

    # predict on one of the images
    img_dir = Path(str(tiny_dataset)).parent / "images" / "val"
    results = model2.predict(str(img_dir), imgsz=64, conf=0.0, max_det=10)
    assert len(results) == 4
    assert len(results[0]) <= 10
    txt = results[0].save_txt(tmp_path / "out.txt", save_conf=True)
    assert Path(txt).exists()

    # export stablehlo and round-trip
    out = model2.export(format="stablehlo", imgsz=64, out=str(tmp_path / "exp"))
    meta = json.loads((Path(out) / "metadata.json").read_text())
    assert meta["nc"] == 2
    from yolov10_3d_tpu.engine.exporter import load_exported

    call = load_exported(out)
    boxes, scores, labels = call(np.zeros((1, 64, 64, 3), np.float32))
    assert boxes.shape[1] == 300


def test_cli_smoke(tiny_dataset, capsys, tmp_path):
    from yolov10_3d_tpu.cfg.cli import entrypoint

    assert entrypoint(["help"]) == 0
    assert entrypoint(["version"]) == 0
    assert entrypoint(["cfg"]) == 0
    img = str(Path(str(tiny_dataset)).parent / "images" / "val" / "0.jpg")
    rc = entrypoint(
        ["predict", "model=yolov10n.yaml", f"source={img}", "imgsz=64", "conf=0.9"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "detections" in out


def test_resume_training(tiny_dataset, tmp_path):
    """Train 2 epochs, resume for 2 more — optimizer/EMA/step restored
    (reference trainer.py:668-728 + the fork's CLI auto-resume)."""
    from yolov10_3d_tpu import YOLOv10

    common = dict(
        data=str(tiny_dataset), imgsz=64, batch=8, workers=2,
        warmup_epochs=0.0, val_period=10, close_mosaic=0, mosaic=0.0,
        mixup=0.0, save_dir=str(tmp_path / "run"), patience=100, amp=False,
    )
    m1 = YOLOv10("yolov10n.yaml")
    s1 = m1.train(epochs=2, **common)
    step_after_2 = int(s1.step)

    m2 = YOLOv10("yolov10n.yaml")
    s2 = m2.train(epochs=4, resume=True, **common)
    assert int(s2.step) > step_after_2
    import csv

    rows = list(csv.DictReader(open(tmp_path / "run" / "results.csv")))
    epochs_seen = [int(r["epoch"]) for r in rows]
    assert epochs_seen == [0, 1, 2, 3]  # resume continued at epoch 2
