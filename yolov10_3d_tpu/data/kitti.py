"""KITTI monocular-3D dataset (reference: data/datasets/kitti.py:19
``KITTIDataset``).

Fixed 1280x384 input, MonoDLE-style affine crop/scale augmentation with
calibration-consistent flip and calib-matched mixup, labels encoded as
projected 3D center + depth + 12-bin heading + size residual vs class mean.

TPU-first: every sample is a padded max_objs=50 record (the reference already
fixes max_objs=50, kitti.py:23); the batch is pure stacked arrays — no ragged
concat + batch_idx.
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .kitti_utils import (
    CLS2ID, CLS_MEAN_SIZE, CLASS_NAMES, Calibration, Object3d,
    affine_transform, angle2class, class2angle, get_affine_transform,
    get_objects_from_label,
)

MAX_OBJS = 50
RESOLUTION = np.array([1280, 384])  # W, H (reference kitti.py:26)


class KITTIDataset:
    """root: the KITTI root containing training/{image_2,label_2,calib} and
    ImageSets/{train,val,trainval,test}.txt, OR a split file path directly."""

    # class-level defaults so JSON subclasses (Waymo/Omni3D) that build their
    # own __init__ inherit a disabled FGDM depth-map path
    load_depth_maps = False
    depth_dir = None

    def __init__(self, root, split: str = "train", args=None, max_objs: int = MAX_OBJS):
        get = (lambda k, d: getattr(args, k, d) if args is not None else d)
        self.max_objs = max_objs
        res = get("kitti_resolution", None)
        self.resolution = np.array(res) if res else RESOLUTION.copy()
        self.cls_mean_size = CLS_MEAN_SIZE.copy()
        self.writelist = list(CLASS_NAMES)
        self.use_camera_dis = bool(get("cam_dis", False))
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

        root = Path(root)
        if root.is_file():  # a split file
            split_file = root
            root = root.parent.parent
        else:
            if root.name in ("training", "testing"):
                root = root.parent
            split_file = root / "ImageSets" / f"{split}.txt"
        self.split = split
        self.idx_list = [x.strip() for x in Path(split_file).read_text().splitlines() if x.strip()]
        self.data_dir = root / ("testing" if split == "test" else "training")
        self.image_dir = self.data_dir / "image_2"
        self.calib_dir = self.data_dir / "calib"
        self.label_dir = self.data_dir / "label_2"
        self.augmenting = split in ("train", "trainval")
        # per-pixel instance-segmentation masks for FGDM depth-map targets
        # (reference kitti.py:54-55,87-90: deepseg/training/image_2/*_seg.png)
        self.load_depth_maps = bool(get("load_depth_maps", False)) and split != "test"
        self.depth_dir = root / "deepseg" / "training" / "image_2"
        if self.load_depth_maps and not self.depth_dir.exists():
            raise FileNotFoundError(
                f"load_depth_maps=True but no segmentation dir at {self.depth_dir}"
            )

    def __len__(self):
        return len(self.idx_list)

    # -- raw accessors --
    def get_image(self, idx: int):
        from PIL import Image

        for ext in (".png", ".jpg"):
            p = self.image_dir / f"{idx:06d}{ext}"
            if p.exists():
                return Image.open(p).convert("RGB")
        raise FileNotFoundError(self.image_dir / f"{idx:06d}.png")

    def get_label(self, idx: int) -> List[Object3d]:
        return get_objects_from_label(self.label_dir / f"{idx:06d}.txt")

    def get_calib(self, idx: int) -> Calibration:
        return Calibration(self.calib_dir / f"{idx:06d}.txt")

    def get_segmentation(self, idx: int):
        """Instance-index mask image: pixel value = the object's label-file
        row (line_index); background 51 (reference kitti.py:87-90)."""
        from PIL import Image

        return Image.open(self.depth_dir / f"{idx:06d}_seg.png")

    def sample_id(self, item: int) -> int:
        return int(self.idx_list[item])

    def _object_valid(self, obj, scale: float) -> bool:
        """KITTI validity filter (kitti.py:240-247); JSON datasets override."""
        if obj.cls_type not in self.writelist:
            return False
        if obj.level_str == "UnKnown" or obj.pos[-1] * scale < self.min_depth_thres:
            return False
        if obj.trucation > 0.5 or obj.occlusion > 2:
            return False
        return True

    # -- sample pipeline (reference kitti.py:116-442; shared verbatim by the
    # Waymo/Omni3D JSON datasets which override the raw accessors) --
    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        rng = self.rng
        index = self.sample_id(item)
        img = self.get_image(index)
        img_size = np.array(img.size, np.float64)  # W, H
        center = img_size / 2
        crop_size = img_size.copy()
        calib = self.get_calib(index)
        scale = 1.0
        random_flip_flag = random_crop_flag = random_mix_flag = False

        seg_mask = self.get_segmentation(index) if self.load_depth_maps else None
        seg_mask_tmp = None

        if self.augmenting:
            if rng.random() < 0.5 and self.mixup:
                random_mix_flag = True
            if rng.random() < self.random_flip:
                random_flip_flag = True
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                if seg_mask is not None:
                    seg_mask = seg_mask.transpose(Image.FLIP_LEFT_RIGHT)
            if rng.random() < self.random_crop:
                random_crop_flag = True
                var = (self.max_scale - self.min_scale) / 2
                mean = (self.max_scale + self.min_scale) / 2
                scale = float(np.clip(rng.standard_normal() * var + mean, self.min_scale, self.max_scale))
                crop_size = img_size * scale
                center[0] += img_size[0] * float(np.clip(rng.standard_normal() * self.shift, -2 * self.shift, 2 * self.shift))
                center[1] += img_size[1] * float(np.clip(rng.standard_normal() * self.shift, -2 * self.shift, 2 * self.shift))

        mix_index = None
        if random_mix_flag:
            random_mix_flag = False
            for _ in range(50):  # find a calib-matched partner (kitti.py:160-184)
                cand = self.sample_id(int(rng.integers(len(self))))
                calib_tmp = self.get_calib(cand)
                if (
                    calib_tmp.cu == calib.cu and calib_tmp.cv == calib.cv
                    and calib_tmp.fu == calib.fu and calib_tmp.fv == calib.fv
                ):
                    img_tmp = self.get_image(cand)
                    if tuple(np.array(img_tmp.size)) == tuple(img_size.astype(int)):
                        if len(self.get_label(index)) + len(self.get_label(cand)) < self.max_objs:
                            if self.load_depth_maps:
                                seg_mask_tmp = self.get_segmentation(cand)
                            if random_flip_flag:
                                img_tmp = img_tmp.transpose(Image.FLIP_LEFT_RIGHT)
                                if seg_mask_tmp is not None:
                                    seg_mask_tmp = seg_mask_tmp.transpose(Image.FLIP_LEFT_RIGHT)
                            img = Image.blend(img, img_tmp, alpha=0.5)
                            random_mix_flag = True
                            mix_index = cand
                            break

        trans, trans_inv = get_affine_transform(center, crop_size, 0, self.resolution, inv=1)
        img = img.transform(
            tuple(self.resolution.tolist()),
            method=Image.AFFINE,
            data=tuple(trans_inv.reshape(-1).tolist()),
            resample=Image.BILINEAR,
        )
        img_np = np.asarray(img, np.uint8)  # HWC; device normalizes (/255)

        def _warp_seg(seg):
            # NEAREST warp, fill 51 = background sentinel (kitti.py:206-216)
            return np.asarray(
                seg.transform(
                    tuple(self.resolution.tolist()),
                    method=Image.AFFINE,
                    data=tuple(trans_inv.reshape(-1).tolist()),
                    resample=Image.NEAREST,
                    fillcolor=51,
                )
            )

        seg_arrays = None
        if self.load_depth_maps:
            seg_arrays = [_warp_seg(seg_mask)]
            if seg_mask_tmp is not None:
                seg_arrays.append(_warp_seg(seg_mask_tmp))
        depth_maps: List[np.ndarray] = []

        M = self.max_objs
        out = {
            "img": img_np,
            "gt_labels": np.zeros((M,), np.int32),
            "gt_bboxes": np.zeros((M, 4), np.float32),
            "gt_center_2d": np.zeros((M, 2), np.float32),
            "gt_size_2d": np.zeros((M, 2), np.float32),
            "gt_center_3d": np.zeros((M, 2), np.float32),
            "gt_size_3d": np.zeros((M, 3), np.float32),
            "gt_depth": np.zeros((M,), np.float32),
            "gt_heading_bin": np.zeros((M,), np.float32),
            "gt_heading_res": np.zeros((M,), np.float32),
            "mask_gt": np.zeros((M,), bool),
            "mean_sizes": self.cls_mean_size.astype(np.float32),
            "mixed": np.array(random_mix_flag, np.uint8),
        }
        # calib vector scaled into the resized frame (reference kitti.py:413-418)
        rw = self.resolution[0] / img_size[0]
        rh = self.resolution[1] / img_size[1]
        out["calib"] = np.array(
            [calib.cu * rw, calib.cv * rh, calib.fu * rw, calib.fv * rh,
             calib.tx * rw, calib.ty * rh],
            np.float32,
        )
        out["img_id"] = np.array(index, np.int64)
        out["trans_inv"] = trans_inv.astype(np.float32)
        out["ori_shape"] = np.array([img_size[1], img_size[0]], np.float32)  # h, w

        if self.split == "test":
            return out

        count = 0
        sources = [(index, None)]
        if random_mix_flag and mix_index is not None:
            sources.append((mix_index, None))
        for src_i, (src_index, _) in enumerate(sources):
            objects = self.get_label(src_index)
            if random_flip_flag:
                flipped_calib = Calibration(
                    {"P2": calib.P2, "R0": calib.R0, "Tr_velo2cam": calib.V2C}
                )
                flipped_calib.flip(img_size)
                for obj in objects:
                    x1, _, x2, _ = obj.box2d
                    obj.box2d[0], obj.box2d[2] = img_size[0] - x2, img_size[0] - x1
                    obj.ry = math.pi - obj.ry
                    obj.pos[0] *= -1
                    if obj.ry > math.pi:
                        obj.ry -= 2 * math.pi
                    if obj.ry < -math.pi:
                        obj.ry += 2 * math.pi
                use_calib = flipped_calib
            else:
                use_calib = calib

            limit = min(len(objects), self.max_objs - count)
            for obj in objects[:limit]:
                if not self._object_valid(obj, scale):
                    continue
                bbox_2d = obj.box2d.copy()
                bbox_2d[:2] = affine_transform(bbox_2d[:2], trans)
                bbox_2d[2:] = affine_transform(bbox_2d[2:], trans)
                size_2d = bbox_2d[2:] - bbox_2d[:2]
                center_2d = (bbox_2d[:2] + bbox_2d[2:]) / 2

                center_3d_cam = obj.pos + [0, -obj.h / 2, 0]
                c3d_img, _ = use_calib.rect_to_img(center_3d_cam.reshape(1, 3))
                center_3d = affine_transform(c3d_img[0], trans)
                if not (0 <= int(center_3d[0]) < self.resolution[0]):
                    continue
                if not (0 <= int(center_3d[1]) < self.resolution[1]):
                    continue
                depth = obj.pos[-1] * scale
                if depth > self.max_depth_threshold:
                    continue
                if seg_arrays is not None:
                    # per-object foreground depth plane (kitti.py:286-287)
                    seg = seg_arrays[min(src_i, len(seg_arrays) - 1)]
                    depth_maps.append(np.where(seg == obj.line_index, depth, 1000.0))

                heading_angle = use_calib.ry2alpha(obj.ry, (obj.box2d[0] + obj.box2d[2]) / 2)
                if heading_angle > math.pi:
                    heading_angle -= 2 * math.pi
                if heading_angle < -math.pi:
                    heading_angle += 2 * math.pi
                hbin, hres = angle2class(heading_angle)

                cls_id = CLS2ID[obj.cls_type]
                j = count
                out["gt_labels"][j] = cls_id
                cxcywh = np.array(
                    [center_2d[0], center_2d[1], size_2d[0], size_2d[1]], np.float32
                )
                out["gt_bboxes"][j] = np.clip(
                    cxcywh / self.resolution[[0, 1, 0, 1]], 0, 1
                )
                out["gt_center_2d"][j] = center_2d
                out["gt_size_2d"][j] = size_2d
                out["gt_center_3d"][j] = center_3d
                out["gt_size_3d"][j] = (
                    np.array([obj.h, obj.w, obj.l], np.float32)
                    - self.cls_mean_size[cls_id]
                )
                if self.use_camera_dis:
                    out["gt_depth"][j] = float(np.linalg.norm(center_3d_cam * scale))
                else:
                    out["gt_depth"][j] = depth
                out["gt_heading_bin"][j] = hbin
                out["gt_heading_res"][j] = hres
                out["mask_gt"][j] = True
                count += 1
                if count >= self.max_objs:
                    break

        if self.load_depth_maps:
            # min-composite the per-object planes; out-of-range -> background
            # (reference kitti.py:409-419)
            if depth_maps:
                dm = np.minimum.reduce(depth_maps)
                dm = np.where(dm > self.max_depth_threshold, 0.0, dm)
            else:
                dm = np.zeros(seg_arrays[0].shape, np.float64)
            out["depth_map"] = dm.astype(np.float32)
        return out


    # -- eval I/O (reference kitti.py:444-464) --
    def save_results(self, results: Dict[str, List], output_dir) -> str:
        out_dir = Path(output_dir) / "preds"
        out_dir.mkdir(parents=True, exist_ok=True)
        for img_file, rows in results.items():
            lines = []
            for r in rows:
                name = CLASS_NAMES[int(r[0])]
                vals = " ".join(f"{v:.2f}" for v in r[1:])
                lines.append(f"{name} 0.0 0 {vals}")
            (out_dir / img_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return str(out_dir)

    def get_stats(self, results: Dict[str, List], save_dir) -> float:
        """Write predictions + run the official AP40 evaluator; fitness is
        3D AP40 moderate @0.7 (reference kitti.py:444-450)."""
        from ..eval.kitti_eval import eval_from_scratch

        pred_dir = self.save_results(results, save_dir)
        result = eval_from_scratch(str(self.label_dir), pred_dir, ap_mode=40)
        return result["3d@0.70"][1]

    def decode_preds(
        self, preds: np.ndarray, calibs: List[Calibration], im_files: List[str],
        inv_trans: np.ndarray, threshold: float = 0.001,
    ) -> Dict[str, List]:
        """Decoded predictions (B, K, 35+scores+labels layout from
        v10_3d_postprocess + postproc) -> KITTI txt rows (reference
        kitti.py:520-576 ``decode_preds``). preds columns:
        bbox(4) c3d(2) s3d(3) hd(24) dep(1) dep_un(1) score(1) label(1)."""
        results = {}
        for i in range(preds.shape[0]):
            rows = []
            for j in range(preds.shape[1]):
                p = preds[i, j]
                score_raw = p[35]
                cls_id = int(p[36])
                bbox = p[:4]
                c3d = p[4:6]
                s3d = p[6:9] + self.cls_mean_size[cls_id]
                hd = p[9:33]
                dep = p[33]
                sigma = float(np.exp(-p[34]))
                score = float(1 / (1 + np.exp(-score_raw))) * sigma
                if score < threshold:
                    continue
                hbin = int(np.argmax(hd[:12]))
                hres = float(hd[12:][hbin])
                alpha = class2angle(hbin, hres, to_label_format=True)
                c3d_orig = affine_transform(c3d, inv_trans[i])
                if self.use_camera_dis:
                    loc = calibs[i].camera_dis_to_rect(c3d_orig[0], c3d_orig[1], dep)[0]
                else:
                    loc = calibs[i].img_to_rect(c3d_orig[0], c3d_orig[1], dep)[0]
                loc = loc.copy()
                loc[1] += s3d[0] / 2
                # bbox back to original frame via the inverse affine
                p1 = affine_transform(bbox[:2], inv_trans[i])
                p2 = affine_transform(bbox[2:], inv_trans[i])
                x_c = (p1[0] + p2[0]) / 2
                ry = calibs[i].alpha2ry(alpha, x_c)
                rows.append(
                    [cls_id, alpha, p1[0], p1[1], p2[0], p2[1]]
                    + s3d.tolist() + loc.tolist() + [ry, score]
                )
            results[im_files[i]] = rows
        return results
