"""Overfit-to-AP convergence proof (VERDICT r2 item #5): train through the
REAL trainer -> validator pipeline until near-saturated AP on a tiny synthetic
dataset with val == train.

This is the strongest offline evidence that the whole training chain (loader,
device batching, dual-assignment loss, optimizer/EMA schedule, checkpointing,
NMS-free decode, metrics) can actually LEARN — the reference's equivalent
evidence is its coco8 smoke-trains plus shipped 500-epoch logs
(/root/reference/tests/test_python.py, logs/yolov10s.csv).

Calibration (round 4, CPU, torch-semantics BN): 900 epochs -> mAP50 = 0.995
for BOTH this framework and the torch reference trained on the same images
(tests/test_convergence_torch.py). At 300 epochs the endpoint is chaotic for
both (ours 0.8475, torch 0.4975 in the round-4 sweep). The boxes are laid
out in non-overlapping half-image cells: with random placement, later
rectangles OVERDRAW earlier ones, so occluded GT boxes are unlearnable and
mAP50 plateaus at ~0.79 no matter how long the train runs.
"""

import time
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def overfit_dataset(tmp_path_factory):
    """8 images, two solid non-overlapping rectangles each; val == train."""
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")
    from _helpers import make_overfit2d_tree

    return make_overfit2d_tree(tmp_path_factory.mktemp("overfit2d"))


@pytest.mark.slow
def test_overfit3d_to_ap40(tmp_path_factory, tmp_path):
    """yolov10n-3D overfits 8 synthetic KITTI images: 2D essentially solved
    (mAP50 >= 0.9) plus a measured strict-3D bar (AP40 3d@0.70 moderate)
    through the REAL train -> Detection3DValidator -> kitti_eval pipeline
    (VERDICT r2 item 5, the 3D half; bar calibration in PARITY.md round-4
    session-4 notes).

    The fixture paints each object as a distinct solid color (apparent size
    ~ 1/z gives depth signal; the per-instance color lets the net memorize
    ry and exact z, which are not otherwise observable from an axis-aligned
    rectangle). z <= 25 m keeps every box >= 43 px tall in the original
    frame, inside the KITTI moderate-difficulty height filter."""
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")
    from _helpers import make_kitti_tree

    from yolov10_3d_tpu import YOLOv10_3D

    yaml_path = make_kitti_tree(
        tmp_path_factory.mktemp("overfit3d"), n_images=8, draw_boxes=True,
        val_all=True, z_range=(8.0, 25.0), n_objects=2,
    )
    res_wh = [320, 96]
    model = YOLOv10_3D("yolov10n_3D.yaml")
    t0 = time.time()
    model.train(
        data=str(yaml_path),
        epochs=300,
        imgsz=res_wh,
        kitti_resolution=res_wh,
        batch=8,
        workers=2,
        warmup_epochs=0.0,
        fliplr=0.0,
        random_crop=0.0,
        mixup=0.0,
        patience=10000,
        amp=False,
        lr0=0.003,
        lrf=0.2,
        optimizer="AdamW",
        nbs=8,
        val_period=10**6,  # validate once at the end, below
        max_depth_threshold=60.0,
        save_dir=str(tmp_path / "run3d"),
    )
    res = model.val(
        data=str(yaml_path), batch=8, kitti_resolution=res_wh,
        save_dir=str(tmp_path / "val3d"),
    )
    took = f"{time.time() - t0:.0f}s"
    # 2D localization must be essentially solved on the train set...
    assert res["mAP50"] >= 0.9, (res, took)
    # ...and the 3D protocol (AP40, 3D IoU 0.70, moderate) must clear a
    # PERCENT-unit bar (eval/kitti_eval._ap scales by 100 — round-4 find:
    # this bar was near-vacuous at 0.7%). Calibration at THIS exact config
    # (tools/exp_overfit3d.py, 300 epochs, 320x96): 3D AP40 = 14.0 with
    # mAP50 0.995 — the strict 3d@0.70-IoU metric is depth-limited at this
    # resolution (~2 m/px sensitivity at z=25), so like the Waymo/Omni3D
    # learn-proofs below the bar sits at roughly half the calibrated value:
    # far above chance (0.0 until ~epoch 150), below run-to-run noise risk.
    assert res["metrics/3D"] >= 7.0, (res, took)


def _overfit_json3d(make_tree, tmp_root, tmp_path, epochs=250):
    """Shared Waymo/Omni3D learn-proof (VERDICT r3 item #4): synthetic
    learnable JSON tree -> real Detection3DTrainer -> dataset.get_stats
    (KITTI AP40 protocol over exported txts; Waymo also logs the
    numpy Waymo-protocol AP/APH). The KITTI chain has its own proof above;
    these pin the JSON dataset encode + eval chains, which round-2's
    Hungarian pre-threshold bug showed can hide AP-deflating defects."""
    from yolov10_3d_tpu import YOLOv10_3D

    yaml_path = make_tree(tmp_root)
    res_wh = [192, 128]
    model = YOLOv10_3D("yolov10n_3D.yaml")
    model.train(
        data=str(yaml_path),
        epochs=epochs,
        imgsz=res_wh,
        kitti_resolution=res_wh,
        batch=8,
        workers=2,
        warmup_epochs=0.0,
        fliplr=0.0,
        random_crop=0.0,
        mixup=0.0,
        patience=10000,
        amp=False,
        lr0=0.003,
        lrf=0.2,
        optimizer="AdamW",
        nbs=8,
        val_period=10**6,
        max_depth_threshold=60.0,
        save_dir=str(tmp_path / "run"),
    )
    return model.val(
        data=str(yaml_path), batch=8, kitti_resolution=res_wh,
        save_dir=str(tmp_path / "val"),
    )


@pytest.mark.slow
def test_overfit_waymo_to_ap(tmp_path_factory, tmp_path):
    """WaymoDataset (JSON schema) trains to a usable AP through the real
    trainer -> Detection3DValidator -> get_stats chain."""
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")
    from _helpers import make_waymo_tree

    res = _overfit_json3d(
        make_waymo_tree, tmp_path_factory.mktemp("waymo_overfit"), tmp_path
    )
    # metrics/3D is now the Waymo-protocol VEHICLE_L2/AP in [0,1] (round-5:
    # fitness promoted from the KITTI-protocol AP40 to the Waymo metric the
    # reference's own get_stats parses out of the official tool's table,
    # waymo.py:408-426). Round-4 calibration at 250 epochs, 192x128:
    # mAP50 0.995, Waymo-protocol VEHICLE_L2/APH 0.79 (AP >= APH always) —
    # the learn-proof asserts roughly half the calibrated value.
    assert res["mAP50"] >= 0.9, res
    assert res["metrics/3D"] >= 0.4, res


@pytest.mark.slow
def test_overfit_omni3d_to_ap(tmp_path_factory, tmp_path):
    """Omni3Dataset (JSON schema incl. quality filters) trains to a usable AP
    through the real trainer -> validator -> get_stats chain."""
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 required")
    from _helpers import make_omni_tree

    res = _overfit_json3d(
        make_omni_tree, tmp_path_factory.mktemp("omni_overfit"), tmp_path
    )
    # percent units; round-4 calibration: mAP50 0.995, 3D 22.5 (see the
    # Waymo twin above for the units/resolution discussion)
    assert res["mAP50"] >= 0.9, res
    assert res["metrics/3D"] >= 10.0, res


@pytest.mark.slow
def test_overfit_to_map50(overfit_dataset, tmp_path):
    """yolov10n overfits 8 images to mAP50 >= 0.9 through the real val loop."""
    from yolov10_3d_tpu import YOLOv10

    model = YOLOv10("yolov10n.yaml")
    t0 = time.time()
    model.train(
        data=str(overfit_dataset),
        epochs=900,
        imgsz=64,
        batch=8,
        workers=2,
        warmup_epochs=0.0,  # regression guard: the old 100-step warmup floor
        # pinned this exact config at ~0 LR and mAP50 stayed 0.000
        close_mosaic=0,
        mosaic=0.0,
        mixup=0.0,
        fliplr=0.0,
        hsv_h=0.0,
        hsv_s=0.0,
        hsv_v=0.0,
        scale=0.0,
        translate=0.0,
        patience=10000,
        amp=False,
        lr0=0.003,
        lrf=0.2,
        optimizer="AdamW",
        nbs=8,
        val_period=10**6,  # validate once at the end, below
        save_dir=str(tmp_path / "run"),
    )
    res = model.val(data=str(overfit_dataset), imgsz=64, batch=8)
    assert res["mAP50"] >= 0.9, (res, f"{time.time() - t0:.0f}s")
    # precision should be high too — NMS-free decode must not spray dupes
    assert res["mp"] >= 0.8, res
