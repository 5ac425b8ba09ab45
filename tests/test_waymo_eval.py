"""Waymo-protocol evaluator (eval/waymo_eval.py, re-implementing the proto
config at reference waymo_eval.py:24-64): Hungarian 3D-IoU matching, AP/APH,
L1/L2, range breakdowns."""

import numpy as np
import pytest


def _frames(rng, n_frames=4, n_obj=5, jitter=0.0, heading_noise=0.0, score_fn=None):
    gt, dt = {}, {}
    for f in range(n_frames):
        boxes = np.stack(
            [
                rng.uniform(-20, 20, n_obj),        # x
                np.full(n_obj, 1.0),                # y
                rng.uniform(5, 60, n_obj),          # z (range driver)
                np.full(n_obj, 4.0),                # l
                np.full(n_obj, 1.6),                # h
                np.full(n_obj, 1.8),                # w
                rng.uniform(-np.pi, np.pi, n_obj),  # ry
            ],
            -1,
        )
        types = rng.integers(0, 2, n_obj)
        gt[f] = {
            "boxes7": boxes,
            "type": types,
            "difficulty": np.ones(n_obj, np.int64),
        }
        d = boxes.copy()
        d[:, 0] += rng.normal(0, jitter, n_obj)
        d[:, 6] += rng.normal(0, heading_noise, n_obj)
        dt[f] = {
            "boxes7": d,
            "type": types,
            "score": score_fn(n_obj, rng) if score_fn else rng.uniform(0.5, 1.0, n_obj),
        }
    return gt, dt


def test_perfect_predictions_ap_one():
    from yolov10_3d_tpu.eval.waymo_eval import waymo_detection_metrics

    rng = np.random.default_rng(0)
    gt, dt = _frames(rng)
    m = waymo_detection_metrics(gt, dt)
    assert m["VEHICLE_L1/AP"] == pytest.approx(1.0, abs=0.01)
    assert m["VEHICLE_L1/APH"] == pytest.approx(1.0, abs=0.01)
    assert m["PEDESTRIAN_L2/AP"] == pytest.approx(1.0, abs=0.01)
    assert m["VEHICLE_L1/Recall@0.95"] == pytest.approx(1.0, abs=0.01)
    # range splits exist and are perfect where populated
    assert any(k.startswith("RANGE_VEHICLE") for k in m)


def test_heading_error_hits_aph_not_ap():
    from yolov10_3d_tpu.eval.waymo_eval import waymo_detection_metrics

    rng = np.random.default_rng(1)
    gt, dt = _frames(rng)
    for f in dt:  # flip every heading by pi: AP unchanged, APH ~ 0
        dt[f]["boxes7"][:, 6] += np.pi
    m = waymo_detection_metrics(gt, dt)
    assert m["VEHICLE_L1/AP"] == pytest.approx(1.0, abs=0.01)
    assert m["VEHICLE_L1/APH"] < 0.05


def test_false_positives_reduce_precision():
    from yolov10_3d_tpu.eval.waymo_eval import waymo_detection_metrics

    rng = np.random.default_rng(2)
    gt, dt = _frames(rng)
    for f in dt:  # add off-position junk detections with low scores
        junk = dt[f]["boxes7"].copy()
        junk[:, 0] += 100.0
        dt[f]["boxes7"] = np.concatenate([dt[f]["boxes7"], junk])
        dt[f]["type"] = np.concatenate([dt[f]["type"], dt[f]["type"]])
        dt[f]["score"] = np.concatenate([dt[f]["score"], np.full(len(junk), 0.1)])
    m = waymo_detection_metrics(gt, dt)
    # high-score TPs still dominate AP; junk caps precision at low cutoffs
    assert 0.5 < m["VEHICLE_L1/AP"] <= 1.0


def test_kitti_rows_adapter():
    from yolov10_3d_tpu.eval.waymo_eval import kitti_rows_to_frames

    rows = {"000007.txt": [[0, 0.1, 10, 10, 50, 50, 1.5, 1.7, 4.0, 2.0, 1.0, 30.0, 0.3, 0.9]]}
    frames = kitti_rows_to_frames(rows)
    assert 7 in frames
    b = frames[7]["boxes7"][0]
    assert b.tolist() == [2.0, 1.0, 30.0, 4.0, 1.5, 1.7, 0.3]
    assert frames[7]["score"][0] == 0.9
