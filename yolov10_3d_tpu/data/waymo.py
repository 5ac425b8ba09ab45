"""Waymo front-camera 3D dataset (reference: data/datasets/waymo.py:23
``WaymoDataset``) — COCO-like JSON annotations, 960x640 input, same encode
pipeline as KITTI (shared via KITTIDataset.__getitem__)."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import List

import numpy as np

from .kitti import KITTIDataset
from .kitti_utils import Calibration, Object3d, object_from_dict

WAYMO_RESOLUTION = np.array([960, 640])
# h, w, l per class id (reference waymo.py:58-62)
WAYMO_MEAN_SIZE = np.array(
    [
        [1.7974, 2.106, 4.8117],
        [1.751, 0.85498, 0.90977],
        [1.7697, 0.83474, 1.769],
    ],
    np.float32,
)
DATA_ID2CLS = {0: "unknown", 1: "Car", 2: "Pedestrian", 3: "Cyclist"}


class WaymoDataset(KITTIDataset):
    def __init__(self, root, split: str = "train", args=None, max_objs: int = 50):
        # root: the split JSON file (annotations + image file_names + calib)
        json_path = Path(root)
        if json_path.is_dir():
            json_path = json_path / f"{split}.json"
        raw = json.loads(Path(json_path).read_text())
        if args is not None and getattr(args, "overfit", False):
            raw["images"] = [im for im in raw["images"] if im["id"] < 50]
            raw["annotations"] = [a for a in raw["annotations"] if a["image_id"] < 50]
        self.path = str(Path(json_path).parent)
        self.imgs = {im["id"]: im for im in sorted(raw["images"], key=lambda im: im["id"])}
        self.idx_to_img_id = dict(enumerate(self.imgs))
        self.anns_by_img = defaultdict(list)
        for ann in raw["annotations"]:
            ann["category"] = DATA_ID2CLS.get(ann["category_id"], "unknown")
            self.anns_by_img[ann["image_id"]].append(ann)

        # reuse the KITTI init for augment config, then override geometry
        get = (lambda k, d: getattr(args, k, d) if args is not None else d)
        self.max_objs = max_objs
        # trainable-resolution override, same knob as KITTI (kitti.py:44)
        res = get("kitti_resolution", None)
        self.resolution = np.array(res) if res else WAYMO_RESOLUTION.copy()
        self.cls_mean_size = WAYMO_MEAN_SIZE.copy()
        self.writelist = ["Car", "Pedestrian", "Cyclist"]
        self.use_camera_dis = False
        self.min_depth_thres = float(get("min_depth_threshold", 1.0))
        self.max_depth_threshold = float(get("max_depth_threshold", 120.0))
        self.random_flip = float(get("fliplr", 0.5))
        self.random_crop = float(get("random_crop", 0.5))
        self.min_scale = float(get("min_scale", 0.8))
        self.max_scale = float(get("max_scale", 1.2))
        self.shift = float(get("translate", 0.1))
        self.mixup = float(get("mixup", 0.5))
        self.seed = int(get("seed", 5))
        self.rng = np.random.default_rng(self.seed)
        self.split = split
        self.augmenting = split in ("train", "trainval")
        self.label_dir = None  # eval goes through exported KITTI-format txts

    def __len__(self):
        return len(self.imgs)

    def sample_id(self, item: int) -> int:
        return int(self.idx_to_img_id[item])

    def get_image(self, idx: int):
        from PIL import Image

        return Image.open(Path(self.path) / self.imgs[idx]["file_name"]).convert("RGB")

    def get_label(self, idx: int) -> List[Object3d]:
        return [object_from_dict(a, i) for i, a in enumerate(self.anns_by_img[idx])]

    def get_calib(self, idx: int) -> Calibration:
        P2 = np.asarray(self.imgs[idx]["calib"], np.float32).reshape(3, 4)
        return Calibration(
            {"P2": P2, "R0": np.eye(3, dtype=np.float32),
             "Tr_velo2cam": np.eye(3, 4, dtype=np.float32)}
        )

    def get_stats(self, results, save_dir) -> float:
        """Fitness = Waymo-protocol VEHICLE Level-2 3D AP (in [0,1]) from the
        in-repo numpy evaluator — the reference's own fitness is exactly this
        cell of the official tool's printed table (waymo.py:408-426 parses
        row 4 / column 2 = VEHICLE_LEVEL_2 AP at IoU 0.7). The official
        proto tool is offline-gated; the KITTI-protocol AP40 over the same
        preds is still computed and kept on ``self.kitti_protocol_ap`` as a
        cross-check, and is the fallback fitness if the protocol evaluator
        fails."""
        from ..eval.kitti_eval import eval_from_scratch

        gt_dir = Path(save_dir) / "gt"
        gt_dir.mkdir(parents=True, exist_ok=True)
        for item in range(len(self)):
            idx = self.sample_id(item)
            lines = []
            for obj in self.get_label(idx):
                if obj.cls_type not in self.writelist:
                    continue
                lines.append(
                    f"{obj.cls_type} 0.0 0 0.0 "
                    f"{obj.box2d[0]:.2f} {obj.box2d[1]:.2f} {obj.box2d[2]:.2f} {obj.box2d[3]:.2f} "
                    f"{obj.h:.2f} {obj.w:.2f} {obj.l:.2f} "
                    f"{obj.pos[0]:.2f} {obj.pos[1]:.2f} {obj.pos[2]:.2f} {obj.ry:.2f}"
                )
            (gt_dir / f"{idx:06d}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
        pred_dir = self.save_results(results, save_dir)
        result = eval_from_scratch(str(gt_dir), pred_dir, ap_mode=40)
        self.kitti_protocol_ap = float(result["3d@0.70"][1])

        # Waymo-protocol metrics (numpy re-implementation of the proto
        # config: Hungarian 3D-IoU matching, AP/APH, range breakdowns —
        # eval/waymo_eval.py); VEHICLE_L2/AP is the fitness.
        try:
            from ..eval.waymo_eval import kitti_rows_to_frames, waymo_detection_metrics
            from .kitti_utils import CLS2ID

            gt_frames = {}
            for item in range(len(self)):
                idx = self.sample_id(item)
                objs = [o for o in self.get_label(idx) if o.cls_type in self.writelist]
                gt_frames[idx] = {
                    "boxes7": np.array(
                        [[o.pos[0], o.pos[1], o.pos[2], o.l, o.h, o.w, o.ry] for o in objs],
                        np.float64,
                    ).reshape(-1, 7),
                    "type": np.array([CLS2ID[o.cls_type] for o in objs], np.int64),
                    "difficulty": np.array(
                        [1 if o.level_str in ("Easy", "Moderate") else 2 for o in objs],
                        np.int64,
                    ),
                }
            dt_frames = kitti_rows_to_frames(results)
            self.waymo_metrics = waymo_detection_metrics(gt_frames, dt_frames)
            from ..utils import LOGGER

            head = {k: round(v, 4) for k, v in self.waymo_metrics.items() if "/AP" in k and "RANGE" not in k}
            LOGGER.info(f"Waymo-protocol metrics: {head} "
                        f"(KITTI-protocol AP40 cross-check: {self.kitti_protocol_ap:.2f})")
            return float(self.waymo_metrics.get("VEHICLE_L2/AP", 0.0))
        except Exception as e:  # protocol metrics must never break val
            from ..utils import LOGGER

            LOGGER.warning(
                f"waymo-protocol metrics failed ({e}); "
                "falling back to KITTI-protocol AP40 fitness"
            )
            return self.kitti_protocol_ap
