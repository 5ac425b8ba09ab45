"""FastSAM prompts, Instances containers, COCO converter, headless app."""

import json

import numpy as np
import pytest


def test_fastsam_prompts():
    from yolov10_3d_tpu.models.fastsam import FastSAMPrompt

    masks = np.zeros((3, 40, 40), bool)
    masks[0, 5:15, 5:15] = True     # small square top-left
    masks[1, 20:38, 20:38] = True   # big square bottom-right
    masks[2, 0:40, 0:3] = True      # left strip
    p = FastSAMPrompt(masks)
    assert p.box_prompt([4, 4, 16, 16])[0] == 0
    assert p.box_prompt([18, 18, 40, 40])[0] == 1
    pm = p.point_prompt([(25, 25)], [1])
    assert pm[25, 25] and not pm[6, 6]
    pm2 = p.point_prompt([(25, 25), (6, 6)], [1, 0])
    assert pm2[25, 25]
    assert len(p.everything_prompt()) == 3
    with pytest.raises(RuntimeError):
        p.text_prompt("a dog")


def test_instances_roundtrip():
    from yolov10_3d_tpu.utils.instance import Instances

    inst = Instances(
        np.array([[0.5, 0.5, 0.2, 0.4]]), bbox_format="xywh", normalized=True
    )
    inst.denormalize(100, 200)
    inst.convert_bbox("xyxy")
    np.testing.assert_allclose(inst.bboxes[0], [40, 60, 60, 140])
    inst.fliplr(100)
    np.testing.assert_allclose(inst.bboxes[0], [40, 60, 60, 140])  # centered box
    inst.add_padding(10, 20)
    np.testing.assert_allclose(inst.bboxes[0], [50, 80, 70, 160])
    inst.clip(60, 150)
    np.testing.assert_allclose(inst.bboxes[0], [50, 80, 60, 150])
    assert inst.remove_zero_area_boxes().all()


def test_coco_converter(tmp_path):
    from yolov10_3d_tpu.data.converter import coco91_to_coco80_class, convert_coco

    m = coco91_to_coco80_class()
    assert m[0] == 0 and m[11] is None and sum(v is not None for v in m) == 80

    data = {
        "images": [{"id": 1, "file_name": "img1.jpg", "width": 100, "height": 50}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 0},
            {"image_id": 1, "category_id": 12, "bbox": [0, 0, 10, 10], "iscrowd": 0},
        ],
    }
    j = tmp_path / "instances.json"
    j.write_text(json.dumps(data))
    out = convert_coco(str(j), save_dir=str(tmp_path / "conv"))
    lines = (tmp_path / "conv/labels/img1.txt").read_text().strip().splitlines()
    assert len(lines) == 1  # category 12 (0-based 11) is a skipped 91->80 id
    vals = lines[0].split()
    assert vals[0] == "0"
    np.testing.assert_allclose(
        [float(v) for v in vals[1:]], [0.2, 0.4, 0.2, 0.4], atol=1e-5
    )


def test_headless_app(tmp_path):
    pytest.importorskip("cv2")
    from yolov10_3d_tpu.app import annotate_file

    out = annotate_file(
        "yolov10n.yaml",
        "/root/reference/ultralytics/assets/bus.jpg",
        out_path=str(tmp_path / "ann.jpg"),
        imgsz=64,
        conf=0.9,
    )
    assert (tmp_path / "ann.jpg").exists()


def test_raycasting():
    from yolov10_3d_tpu.data.raycasting import (
        box_visibility, project_to_image, ray_box_intersection,
    )

    P2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 180, 0], [0, 0, 1, 0]])
    pts = np.array([[0.0, 0.0, 10.0], [1.0, 0.5, 20.0]])
    uv, depth = project_to_image(pts, P2[None], return_depth=True)
    np.testing.assert_allclose(uv[0], [600, 180])
    np.testing.assert_allclose(depth, [10, 20])

    hit, tmin = ray_box_intersection(
        np.zeros(3), np.array([[0, 0, 1.0], [1, 0, 0.0]]),
        np.array([-1, -1, 5.0]), np.array([1, 1, 7.0]),
    )
    assert hit[0] and not hit[1]
    assert abs(tmin[0] - 5.0) < 1e-9

    # box behind an occluder is mostly invisible
    corners = np.array([[0, 0, 20.0]])
    occ = np.array([[[-1, -1, 5.0], [1, 1, 7.0]]])
    assert box_visibility(corners, occ, P2) == 0.0
    assert box_visibility(np.array([[10, 0, 20.0]]), occ, P2) == 1.0


def test_autobatch_compile_only():
    import jax
    import jax.numpy as jnp

    from yolov10_3d_tpu.utils.autobatch import check_train_batch_size

    def step(state, batch):
        return state + batch["x"].sum()

    b = check_train_batch_size(
        step, lambda b: {"x": jnp.zeros((b, 8))}, jnp.zeros(()), max_batch=64
    )
    assert b >= 1


def test_profiling_utils():
    import jax
    import jax.numpy as jnp

    from yolov10_3d_tpu.utils.profiling import Profile, flops, model_info
    from _helpers import build_jax

    with Profile() as p:
        x = sum(range(1000))
    assert p.t > 0

    f = flops(lambda a, b: a @ b, jnp.zeros((64, 64)), jnp.zeros((64, 64)))
    assert f is None or f >= 2 * 64**3 * 0.9

    model, spec, variables = build_jax("n")
    info = model_info(model, variables, imgsz=64)
    assert info["parameters"] > 2e6


def test_graft_backbone(tmp_path):
    """2D COCO backbone -> 3D model grafting (reference train.py:50-62)."""
    import jax
    import jax.numpy as jnp

    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.utils.torch_convert import graft_backbone
    from _helpers import build_jax

    model2d, spec2d, v2d = build_jax("n")
    model3d, spec3d = build_model("yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml")
    x = jnp.zeros((1, 64, 64, 3))
    v3d = jax.jit(model3d.init, static_argnames="train")(
        jax.random.PRNGKey(1), x, train=False
    )
    grafted = graft_backbone(v3d, v2d, spec3d.head_index)
    # backbone layer copied exactly
    a = grafted["params"]["model_0"]["conv"]["kernel"]
    b = v2d["params"]["model_0"]["conv"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # head untouched (different key sets anyway)
    hk = f"model_{spec3d.head_index}"
    a = grafted["params"][hk]
    b = v3d["params"][hk]
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b))
    # grafted model still runs
    out = jax.jit(lambda v, x: model3d.apply(v, x, train=False))(grafted, x)
    assert "one2one" in out


def test_write_csv_schema_growth(tmp_path):
    """Val epochs add metrics/* columns after the header exists; rows must
    stay aligned (3D overfit probe found AP landing in unlabeled columns)."""
    import csv

    from yolov10_3d_tpu.engine.trainer import DetectionTrainer

    p = tmp_path / "results.csv"
    DetectionTrainer._write_csv(p, {"epoch": 0, "loss": 1.5})
    DetectionTrainer._write_csv(p, {"epoch": 1, "loss": 1.2, "metrics/3D": 0.9})
    DetectionTrainer._write_csv(p, {"epoch": 2, "loss": 1.0})
    with open(p, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["0", "1", "2"]
    assert rows[1]["metrics/3D"] == "0.9"
    assert rows[0]["metrics/3D"] == "" and rows[2]["metrics/3D"] == ""
    assert rows[2]["loss"] == "1.0"
