"""Seg/Pose/OBB/Classify validation end-to-end (reference:
models/yolo/{segment,pose,obb,classify}/val.py) — synthetic datasets
through Model.val() / the validators, fixed shapes, finite metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_yaml(tmp_path, val_dir, extra=""):
    y = tmp_path / "data.yaml"
    y.write_text(
        f"path: {tmp_path}\nval: {val_dir}\ntrain: {val_dir}\n"
        f"names:\n  0: a\n  1: b\n{extra}"
    )
    return str(y)


def _make_img(path, size=(64, 64)):
    from PIL import Image

    rng = np.random.default_rng(abs(hash(str(path))) % 2**32)
    Image.fromarray(
        rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
    ).save(path)


def test_nms_extra_passthrough():
    from yolov10_3d_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(0)
    B, A, nc, E = 2, 32, 3, 7
    preds = np.zeros((B, A, 4 + nc), np.float32)
    preds[..., :2] = rng.uniform(20, 40, (B, A, 2))
    preds[..., 2:4] = rng.uniform(5, 10, (B, A, 2))
    preds[..., 4:] = rng.uniform(0, 0.2, (B, A, nc))
    preds[0, 3, 4] = 0.9  # one confident det
    extra = rng.standard_normal((B, A, E)).astype(np.float32)
    boxes, scores, labels, valid, out_extra = non_max_suppression(
        jnp.asarray(preds), conf_thres=0.5, max_det=10, extra=jnp.asarray(extra)
    )
    assert out_extra.shape == (B, 10, E)
    assert bool(valid[0, 0]) and not bool(valid[1, 0])
    np.testing.assert_allclose(np.asarray(out_extra)[0, 0], extra[0, 3], rtol=1e-6)


def test_segmentation_val_e2e(tmp_path):
    from yolov10_3d_tpu.engine.model import YOLO

    img_dir = tmp_path / "val" / "images"
    lbl_dir = tmp_path / "val" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        _make_img(img_dir / f"{i}.jpg")
        (lbl_dir / f"{i}.txt").write_text(
            "0 0.2 0.2 0.6 0.2 0.6 0.6 0.2 0.6\n1 0.7 0.7 0.9 0.7 0.8 0.9\n"
        )
    data = _write_yaml(tmp_path, "val/images")
    m = YOLO("yolov8-seg.yaml")
    res = m.val(data=data, imgsz=64, batch=2, conf=0.001)
    assert "metrics/mAP50-95(M)" in res and np.isfinite(res["fitness"])


def test_pose_val_e2e(tmp_path):
    from yolov10_3d_tpu.engine.model import YOLO

    nk = 17  # must match the model head (yolov8-pose.yaml kpt_shape)
    img_dir = tmp_path / "val" / "images"
    lbl_dir = tmp_path / "val" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        _make_img(img_dir / f"{i}.jpg")
        kp = " ".join(f"{v:.3f}" for v in rng.uniform(0.2, 0.8, nk * 3))
        (lbl_dir / f"{i}.txt").write_text(f"0 0.5 0.5 0.4 0.4 {kp}\n")
    data = _write_yaml(tmp_path, "val/images", extra="kpt_shape: [17, 3]\n")
    m = YOLO("yolov8-pose.yaml")
    res = m.val(data=data, imgsz=64, batch=2)
    assert "metrics/mAP50-95(P)" in res and np.isfinite(res["fitness"])


def test_classification_val_e2e(tmp_path):
    from yolov10_3d_tpu.engine.model import YOLO

    for cls in ("a", "b"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            _make_img(d / f"{i}.jpg", size=(64, 64))
    data = _write_yaml(tmp_path, "val")
    m = YOLO("yolov8-cls.yaml")
    res = m.val(data=data, imgsz=64, batch=3)
    # yaml-default nc (1000) + untrained weights: accuracies are just valid
    assert 0.0 <= res["metrics/accuracy_top1"] <= 1.0
    assert 0.0 <= res["metrics/accuracy_top5"] <= 1.0
    assert np.isfinite(res["fitness"])


def test_obb_validator_synthetic():
    from yolov10_3d_tpu.engine.validator_tasks import OBBValidator
    from yolov10_3d_tpu.nn.build import build_model

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v8/yolov8-obb.yaml", nc=2)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(model.init, static_argnames="train")(jax.random.PRNGKey(0), x0, train=False)
    rng = np.random.default_rng(0)
    M = 4
    batch = {
        "img": rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8),
        "gt_labels": rng.integers(0, 2, (2, M)).astype(np.int32),
        "gt_bboxes": np.concatenate(
            [rng.uniform(0.2, 0.8, (2, M, 4)), rng.uniform(-0.5, 0.5, (2, M, 1))], -1
        ).astype(np.float32),
        "mask_gt": np.ones((2, M), bool),
    }
    res = OBBValidator(model, spec)(v, [batch], conf=0.001)
    assert "fitness" in res and np.isfinite(res["fitness"])


@pytest.mark.parametrize(
    "yaml_name,field",
    [
        ("yolov8.yaml", "boxes"),
        ("yolov8-seg.yaml", "masks"),
        ("yolov8-pose.yaml", "keypoints"),
        ("yolov8-obb.yaml", "obb"),
        ("yolov8-cls.yaml", "probs"),
        ("rtdetr-l.yaml", "boxes"),
        ("yolov5.yaml", "boxes"),
        ("yolov9c.yaml", "boxes"),
        ("yolov8-world.yaml", "boxes"),
    ],
)
def test_predict_all_heads(yaml_name, field):
    """Model.predict works for every head family and fills the right
    Results field (reference task_map predictor dispatch)."""
    from yolov10_3d_tpu.engine.model import YOLO

    m = YOLO(yaml_name)
    img = np.random.default_rng(0).integers(0, 255, (48, 56, 3), np.uint8)
    res = m.predict(img, imgsz=64, conf=0.0)[0]
    val = getattr(res, field)
    assert val is not None
    if field == "probs":
        assert 0 <= val.top1 < 1000 and len(val.top5) == 5
    elif field == "masks":
        assert val.data.shape[-2:] == (48, 56)
    elif field == "keypoints":
        assert val.data.shape[1:] == (17, 3)
        assert (val.xy[..., 0] <= 56).all() and (val.xy[..., 1] <= 48).all()
    elif field == "obb":
        assert val.data.shape[-1] == 7
        corners = val.xyxyxyxy
        assert corners.shape[1:] == (4, 2)


def test_cli_task_words(tmp_path):
    """`yolo10 segment predict ...` grammar accepts the task vocabulary
    (reference cfg/__init__.py entrypoint TASKS)."""
    from PIL import Image

    from yolov10_3d_tpu.cfg.cli import entrypoint

    img = tmp_path / "x.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 48, 3), np.uint8)
    ).save(img)
    rc = entrypoint(
        ["segment", "predict", "model=yolov8-seg.yaml", f"source={img}",
         "imgsz=64", "conf=0.0"]
    )
    assert rc == 0


def test_rtdetr_val_e2e(tmp_path):
    from yolov10_3d_tpu.engine.model import Model

    img_dir = tmp_path / "val" / "images"
    lbl_dir = tmp_path / "val" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(2):
        _make_img(img_dir / f"{i}.jpg")
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    data = _write_yaml(tmp_path, "val/images")
    m = Model("rtdetr-l.yaml")
    res = m.val(data=data, imgsz=64, batch=2)
    assert "fitness" in res and np.isfinite(res["fitness"])


def test_predict_save_outputs(tmp_path):
    """predict(save/save_txt/save_crop) writes annotated image, YOLO txt and
    crops (reference predictor write_results/save_preds)."""
    from yolov10_3d_tpu.engine.model import YOLOv10

    m = YOLOv10("yolov10n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    res = m.predict(
        img, imgsz=64, conf=0.0, save=True, save_txt=True, save_crop=True,
        save_dir=str(tmp_path),
    )
    # ndarray sources get index-suffixed stems so multi-image predicts
    # don't overwrite each other (review finding)
    assert (tmp_path / "array0.jpg").exists()
    assert (tmp_path / "labels" / "array0.txt").exists()
    if len(res[0].boxes):
        assert any((tmp_path / "crops").rglob("*.jpg"))
