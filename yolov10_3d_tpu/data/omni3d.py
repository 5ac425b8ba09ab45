"""Omni3D / KITTI-in-Omni3D JSON dataset (reference: data/datasets/omni3d.py:23
``Omni3Dataset``) — 960x640 input, Omni3D annotation schema with visibility /
truncation / depth-error quality filters."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import List

import numpy as np

from .kitti import KITTIDataset
from .kitti_utils import CLS_MEAN_SIZE, Calibration, Object3d, object_from_dict

OMNI_RESOLUTION = np.array([960, 640])


class Omni3Dataset(KITTIDataset):
    def __init__(self, root, split: str = "train", args=None, max_objs: int = 50):
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
        id2cls = {c["id"]: c["name"].title() for c in raw.get("categories", [])}
        self.anns_by_img = defaultdict(list)
        for ann in raw["annotations"]:
            ann["category"] = id2cls.get(ann["category_id"], "unknown")
            self.anns_by_img[ann["image_id"]].append(ann)

        get = (lambda k, d: getattr(args, k, d) if args is not None else d)
        self.max_objs = max_objs
        # trainable-resolution override, same knob as KITTI (kitti.py:44)
        res = get("kitti_resolution", None)
        self.resolution = np.array(res) if res else OMNI_RESOLUTION.copy()
        self.cls_mean_size = CLS_MEAN_SIZE.copy()
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
        self.label_dir = None

    def __len__(self):
        return len(self.imgs)

    def sample_id(self, item: int) -> int:
        return int(self.idx_to_img_id[item])

    def get_image(self, idx: int):
        from PIL import Image

        rel = self.imgs[idx].get("file_path", self.imgs[idx].get("file_name"))
        rel = rel.replace("waymo/images/", "")
        return Image.open(Path(self.path) / rel).convert("RGB")

    def get_label(self, idx: int) -> List[Object3d]:
        return [object_from_dict(a, i) for i, a in enumerate(self.anns_by_img[idx])]

    def get_calib(self, idx: int) -> Calibration:
        K = np.asarray(self.imgs[idx]["K"], np.float32)
        P2 = np.hstack([K, np.zeros((3, 1), np.float32)])
        return Calibration(
            {"P2": P2, "R0": np.eye(3, dtype=np.float32),
             "Tr_velo2cam": np.eye(3, 4, dtype=np.float32)}
        )

    def _object_valid(self, obj, scale: float) -> bool:
        """Omni3D quality filter (reference omni3d.py:292-296)."""
        if obj.cls_type not in self.writelist:
            return False
        if getattr(obj, "behind_camera", False) or obj.pos[-1] * scale < self.min_depth_thres:
            return False
        if not getattr(obj, "valid3D", True) or getattr(obj, "num_lidar", 1) == 0:
            return False
        if getattr(obj, "depth_error", 0.0) >= 0.5:
            return False
        truncation = getattr(obj, "truncation", 0.0)
        visibility = getattr(obj, "visibility", -1)
        if truncation >= 0.75 or (visibility <= 0.25 and visibility != -1):
            return False
        return True

    def get_stats(self, results, save_dir) -> float:
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
        return result["3d@0.70"][1]
