#!/usr/bin/env python
"""Calibrate the 3D overfit-to-AP40 convergence test (VERDICT r2 item #5,
3D leg): train yolov10n-3D on a tiny synthetic KITTI set (draw_boxes=True:
solid color-coded rectangles; depth ~ box width, ry memorizable from color)
and print the metrics/3D (= Car 3D AP40 moderate @0.7 IoU) trajectory.

Usage: python tools/exp_overfit3d.py [epochs] [val_period] [zmax] [in_frame]
Runs on CPU (same platform as the test suite).

Round-4 finding: at z_range=(8,25) / 320x96 the strict 3d@0.70 metric is
depth-limited (AP40 = 14.0 at 300 epochs even with mAP50 0.995 — ~0.7 m
depth tolerance for a 3.9 m car vs ~2 m/px apparent-size sensitivity at
z=25). The near-z in-frame fixture (zmax 15, in_frame 1) roughly doubles
the tolerance and removes frame-clipped boxes, so the proof can carry a
meaningful strict-3D bar.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import tempfile
from pathlib import Path

from _helpers import make_kitti_tree

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
VAL_PERIOD = int(sys.argv[2]) if len(sys.argv) > 2 else 50
ZMAX = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
IN_FRAME = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
RES = [320, 96]


def main():
    from yolov10_3d_tpu import YOLOv10_3D

    tmp = Path(tempfile.mkdtemp(prefix="overfit3d_"))
    yaml_path = make_kitti_tree(
        tmp / "kitti", n_images=8, draw_boxes=True, n_objects=2,
        z_range=(8.0, ZMAX), val_all=True, x_in_frame=IN_FRAME,
    )
    model = YOLOv10_3D("yolov10n_3D.yaml")
    t0 = time.time()
    model.train(
        data=str(yaml_path),
        epochs=EPOCHS,
        batch=8,
        imgsz=RES,
        kitti_resolution=RES,
        workers=2,
        val_period=VAL_PERIOD,
        amp=False,
        save_dir=str(tmp / "run"),
        patience=10**6,
        warmup_epochs=0.0,
        fliplr=0.0,
        random_crop=0.0,
        mixup=0.0,
        translate=0.0,
        lr0=0.003,
        lrf=0.2,
        optimizer="AdamW",
        nbs=8,
        max_depth_threshold=60.0,
    )
    print(f"train wall: {time.time()-t0:.0f}s", flush=True)
    import csv

    with open(tmp / "run" / "results.csv") as f:
        for r in csv.DictReader(f):
            if r.get("metrics/3D", "") not in ("", "nan"):
                print(
                    f"epoch {r['epoch']:>4}  3D AP40 {float(r['metrics/3D']):.4f}",
                    flush=True,
                )
    out = model.val(
        data=str(yaml_path), batch=8, kitti_resolution=RES,
        save_dir=str(tmp / "valfinal"),
    )
    print("final val:", {k: round(float(v), 4) for k, v in out.items() if isinstance(v, (int, float))}, flush=True)
    print("dir:", tmp, flush=True)


if __name__ == "__main__":
    main()
