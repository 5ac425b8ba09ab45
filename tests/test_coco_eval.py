"""COCO-json evaluation (reference detect/val.py:276-300) and task metrics
(reference metrics.py:928-1324): numpy COCOeval vs our own AP machinery,
mask/keypoint/rotated IoU, and per-task metric classes."""

import numpy as np
import pytest


def _make_dets(rng, n_img=8, n_gt=4, nc=3, jitter=2.0, n_fp=2):
    """Synthetic GT + jittered predictions (+ random false positives)."""
    gts, dts = [], []
    ann_id = 0
    for img in range(n_img):
        for _ in range(n_gt):
            c = int(rng.integers(0, nc))
            x, y = rng.uniform(10, 400, 2)
            w, h = rng.uniform(20, 80, 2)
            gts.append(
                {"id": ann_id, "image_id": img, "category_id": c,
                 "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0}
            )
            ann_id += 1
            jb = [x + rng.normal(0, jitter), y + rng.normal(0, jitter), w, h]
            dts.append(
                {"image_id": img, "category_id": c, "bbox": jb,
                 "score": float(rng.uniform(0.5, 1.0))}
            )
        for _ in range(n_fp):
            dts.append(
                {"image_id": img, "category_id": int(rng.integers(0, nc)),
                 "bbox": list(rng.uniform(10, 300, 4)),
                 "score": float(rng.uniform(0.0, 0.5))}
            )
    return gts, dts


def test_coco_eval_perfect():
    from yolov10_3d_tpu.utils.coco import COCOEvaluator

    rng = np.random.default_rng(0)
    gts, _ = _make_dets(rng, jitter=0.0, n_fp=0)
    dts = [
        {"image_id": g["image_id"], "category_id": g["category_id"],
         "bbox": g["bbox"], "score": 0.9}
        for g in gts
    ]
    res = COCOEvaluator({"annotations": gts}, dts).evaluate()
    assert res["map"] == pytest.approx(1.0, abs=0.02)
    assert res["map50"] == pytest.approx(1.0, abs=0.02)


def test_coco_eval_vs_own_ap():
    """COCO protocol and our DetMetrics agree within interpolation tolerance
    on the same synthetic detections."""
    from yolov10_3d_tpu.utils.coco import COCOEvaluator
    from yolov10_3d_tpu.utils.metrics import DetMetrics

    rng = np.random.default_rng(1)
    gts, dts = _make_dets(rng, n_img=16, n_gt=5, jitter=4.0, n_fp=3)
    coco = COCOEvaluator({"annotations": gts}, dts).evaluate()

    m = DetMetrics(nc=3)
    for img in range(16):
        g = [x for x in gts if x["image_id"] == img]
        d = [x for x in dts if x["image_id"] == img]
        gb = np.array([x["bbox"] for x in g], np.float64)
        gb[:, 2:] += gb[:, :2]
        db = np.array([x["bbox"] for x in d], np.float64)
        db[:, 2:] += db[:, :2]
        m.process_batch(
            db, np.array([x["score"] for x in d]),
            np.array([x["category_id"] for x in d]),
            gb, np.array([x["category_id"] for x in g]),
        )
    own = m.results()
    assert abs(coco["map50"] - own["mAP50"]) < 0.05
    assert abs(coco["map"] - own["mAP50-95"]) < 0.05


def test_match_predictions_protocol():
    """Our claim-matching formulation is bit-identical to the reference's
    sort + double-np.unique idiom (validator.py:229-269) on 2000 random
    (labels, detections, IoU) instances, including empty edge cases."""
    from yolov10_3d_tpu.utils.metrics import match_predictions

    def reference_protocol(pred_classes, true_classes, iou, iouv):
        correct = np.zeros((pred_classes.shape[0], iouv.shape[0]), bool)
        iou = np.where(true_classes[:, None] == pred_classes[None, :], iou, 0.0)
        for i, threshold in enumerate(iouv):
            matches = np.array(np.nonzero(iou >= threshold)).T
            if matches.shape[0]:
                if matches.shape[0] > 1:
                    matches = matches[iou[matches[:, 0], matches[:, 1]].argsort()[::-1]]
                    matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                    matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
                correct[matches[:, 1].astype(int), i] = True
        return correct

    rng = np.random.default_rng(0)
    iouv = np.linspace(0.5, 0.95, 10)
    for _ in range(2000):
        m, n = rng.integers(0, 12), rng.integers(0, 30)
        tc, pc = rng.integers(0, 5, m), rng.integers(0, 5, n)
        iou = rng.uniform(0, 1, (m, n))
        got = match_predictions(pc, tc, iou.copy(), iouv)
        want = reference_protocol(pc, tc, iou.copy(), iouv)
        np.testing.assert_array_equal(got, want)


def test_coco_eval_crowd_and_area():
    """iscrowd GTs are ignored (not counted as FN) and area splits work."""
    from yolov10_3d_tpu.utils.coco import COCOEvaluator

    gts = [
        {"id": 0, "image_id": 0, "category_id": 0, "bbox": [10, 10, 50, 50],
         "area": 2500, "iscrowd": 0},
        {"id": 1, "image_id": 0, "category_id": 0, "bbox": [200, 200, 90, 90],
         "area": 8100, "iscrowd": 1},
    ]
    dts = [{"image_id": 0, "category_id": 0, "bbox": [10, 10, 50, 50], "score": 0.9}]
    res = COCOEvaluator({"annotations": gts}, dts).evaluate()
    assert res["map50"] == pytest.approx(1.0, abs=0.02)  # crowd not a miss
    assert res["map_medium"] >= 0.0


def test_validator_save_json(tmp_path):
    """DetectionValidator writes COCO-format predictions.json."""
    import json

    import jax
    import jax.numpy as jnp

    from yolov10_3d_tpu.data.dataset import DataLoader
    from yolov10_3d_tpu.engine.validator import DetectionValidator
    from yolov10_3d_tpu.nn.build import build_model

    # synthetic in-memory "dataset": reuse YOLODataset batch contract
    class FakeDS:
        im_files = [f"{i:012d}.jpg" for i in range(4)]

        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {
                "img": rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
                "gt_labels": np.zeros(5, np.int32),
                "gt_bboxes": np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32), (5, 1)),
                "mask_gt": np.ones(5, bool),
                "im_id": np.asarray(i, np.int64),
            }

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    ds = FakeDS()
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False)
    out = DetectionValidator(model, spec, None)(
        v, loader, conf=0.0, max_det=10,
        save_json_path=str(tmp_path / "pred.json"), dataset=ds,
    )
    recs = json.loads((tmp_path / "pred.json").read_text())
    assert recs and {"image_id", "category_id", "bbox", "score"} <= set(recs[0])
    assert {r["image_id"] for r in recs} <= {0, 1, 2, 3}


def test_mask_kpt_obb_metrics():
    from yolov10_3d_tpu.utils.metrics import (
        ClassifyMetrics, OBBMetrics, PoseMetrics, SegmentMetrics, kpt_iou,
        mask_iou, probiou_np,
    )

    rng = np.random.default_rng(0)
    # mask_iou: identical masks -> 1, disjoint -> 0
    m1 = np.zeros((2, 16, 16)); m1[0, :8] = 1; m1[1, 8:] = 1
    iou = mask_iou(m1, m1)
    assert np.allclose(np.diag(iou), 1.0) and iou[0, 1] == 0.0

    # kpt_iou: perfect keypoints -> 1
    k = np.concatenate([rng.uniform(0, 100, (3, 17, 2)), np.ones((3, 17, 1))], -1)
    oks = kpt_iou(k, k, area=np.full(3, 1000.0))
    assert np.allclose(np.diag(oks), 1.0, atol=1e-5)

    # probiou_np agrees with the jax implementation
    import jax.numpy as jnp

    from yolov10_3d_tpu.ops.boxes import probiou

    a = np.concatenate([rng.uniform(50, 150, (6, 2)), rng.uniform(10, 40, (6, 2)),
                        rng.uniform(-1.5, 1.5, (6, 1))], -1).astype(np.float32)
    b = np.concatenate([rng.uniform(50, 150, (4, 2)), rng.uniform(10, 40, (4, 2)),
                        rng.uniform(-1.5, 1.5, (4, 1))], -1).astype(np.float32)
    got = probiou_np(a, b)
    want = np.asarray(probiou(jnp.asarray(a)[:, None], jnp.asarray(b)[None, :]))
    assert np.allclose(got, want, atol=1e-4)

    # SegmentMetrics: perfect boxes+masks -> fitness == 2x box fitness
    sm = SegmentMetrics(nc=2)
    boxes = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float64)
    masks = np.zeros((2, 128, 128)); masks[0, 10:50, 10:50] = 1; masks[1, 60:100, 60:100] = 1
    cls = np.array([0, 1])
    sm.process_batch_seg(boxes, np.array([0.9, 0.9]), cls, masks, boxes, cls, masks)
    r = sm.results()
    assert r["fitness"] == pytest.approx(2.0, abs=0.05)
    assert r["metrics/mAP50-95(M)"] == pytest.approx(1.0, abs=0.02)

    # PoseMetrics: perfect kpts
    pm = PoseMetrics(nc=1)
    kp = np.concatenate([rng.uniform(20, 90, (2, 17, 2)), np.ones((2, 17, 1))], -1)
    pm.process_batch_pose(boxes, np.array([0.9, 0.9]), np.zeros(2), kp, boxes, np.zeros(2), kp)
    r = pm.results()
    assert r["metrics/mAP50-95(P)"] == pytest.approx(1.0, abs=0.02)

    # OBBMetrics: perfect rotated boxes
    om = OBBMetrics(nc=2)
    om.process_batch(a[:2], np.array([0.9, 0.8]), np.array([0, 1]), a[:2], np.array([0, 1]))
    assert om.results()["mAP50-95"] == pytest.approx(1.0, abs=0.02)

    # ClassifyMetrics
    cm = ClassifyMetrics()
    cm.process_batch(np.array([[1, 0, 2, 3, 4], [0, 1, 2, 3, 4]]), np.array([1, 4]))
    r = cm.results()
    assert r["metrics/accuracy_top1"] == 0.5 and r["metrics/accuracy_top5"] == 1.0
