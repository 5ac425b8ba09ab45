"""Datasets for the segmentation / pose / OBB / classification tasks
(reference: data/dataset.py ``YOLODataset(task=...)`` parses segment and
keypoint label columns; ``ClassificationDataset``:227).

Eval mode letterboxes with padded fixed shapes; train mode (augment=True)
runs the full geometric pipeline — mosaic/perspective/copy-paste/flip — with
instance polygons, keypoints, or OBB corners riding the base dataset's
``points`` channel (data/augment.py module docstring; reference
augment.py:347 RandomPerspective segment/keypoint transforms, :753 CopyPaste,
:973 v8_transforms)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from .dataset import YOLODataset
from .preprocess import letterbox_geometry
from .utils import polygon2mask

# COCO-17 left/right chiral swap for horizontal flips — the value COCO pose
# YAMLs put in their flip_idx key (e.g. coco8-pose.yaml). Exported for
# convenience; never auto-applied (a 17-point skeleton isn't necessarily COCO)
COCO17_FLIP_IDX = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15)


class SegmentationEvalDataset(YOLODataset):
    """YOLO segment labels: `cls x1 y1 x2 y2 ...` normalized polygon rows.
    Emits detect keys + gt_masks (M, mask_h, mask_w) binary, built from the
    letterboxed (eval) or augmented (train) polygons (reference
    Format(mask=True), augment.py:876)."""

    points_kind = "segments"

    def __init__(self, *args, mask_ratio: int = 4, seg_points: int = 200, **kwargs):
        self.mask_ratio = mask_ratio
        self.seg_points = seg_points
        self._segments: Dict[int, list] = {}
        super().__init__(*args, **kwargs)

    def _raw_points(self, i: int) -> np.ndarray:
        """(n, K, 2) arclength-resampled polygons in raw-image pixels."""
        from .augment import resample_polygon

        if i not in self._segments:
            self._parse_label_file(i)
        rh, rw = (int(v) for v in self.image_shapes()[i])
        segs = self._segments.get(i, [])
        if not segs:
            return np.zeros((0, self.seg_points, 2), np.float32)
        return np.stack(
            [resample_polygon(p * np.array([rw, rh], np.float32), self.seg_points)
             for p in segs]
        )

    def _format_points(self, out, labels, points, img_hw) -> None:
        h, w = img_hw
        mh, mw = h // self.mask_ratio, w // self.mask_ratio
        M = self.max_boxes
        gt_masks = np.zeros((M, mh, mw), np.uint8)
        if points is not None:
            for j, poly in enumerate(points[:M]):
                gt_masks[j] = polygon2mask((mh, mw), poly[..., :2] / self.mask_ratio)
        out["gt_masks"] = gt_masks

    def _load_labels(self, root):
        # always parse: the npz label cache would skip _parse_label_file and
        # lose the polygon side-channel
        return [self._parse_label_file(i) for i in range(len(self.im_files))]

    def _parse_label_file(self, i: int) -> np.ndarray:
        """Rows: cls + polygon -> (n, 5) cls+xywh-norm; polygons kept aside."""
        p = Path(self.label_files[i])
        segs, rows = [], []
        if p.exists():
            for ln in p.read_text().splitlines():
                vals = ln.split()
                if len(vals) < 7:  # cls + >=3 points
                    continue
                cls = float(vals[0])
                pts = np.array(vals[1:], np.float32).reshape(-1, 2)
                x1, y1 = pts.min(0)
                x2, y2 = pts.max(0)
                rows.append([cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                segs.append(pts)
        self._segments[i] = segs
        return np.array(rows, np.float32).reshape(-1, 5)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        out = super().__getitem__(i)
        if self.augment:  # train path: gt_masks already set by _format_points
            return out
        h, w = out["img"].shape[:2]
        mh, mw = h // self.mask_ratio, w // self.mask_ratio
        M = self.max_boxes
        gt_masks = np.zeros((M, mh, mw), np.uint8)
        # recompute the letterbox transform to place polygons (same math as
        # the base __getitem__ eval path)
        # geometry only — no second decode (review finding): the base
        # __getitem__ already letterboxed the pixels with the same math
        rh, rw = (int(v) for v in self.image_shapes()[i])
        ratio, dw, dh = letterbox_geometry((rh, rw), (h, w), scaleup=False)
        for j, pts in enumerate(self._segments.get(i, [])[:M]):
            px = pts * np.array([rw, rh], np.float32) * ratio + np.array([dw, dh], np.float32)
            gt_masks[j] = polygon2mask((mh, mw), px / self.mask_ratio)
        out["gt_masks"] = gt_masks
        return out


class PoseEvalDataset(YOLODataset):
    """YOLO pose labels: `cls cx cy w h (x y [v]) * nk` normalized.
    Emits detect keys + gt_kpts (M, nk, 2|3) in letterboxed (eval) or
    augmented (train) input pixels."""

    points_kind = "keypoints"

    def __init__(
        self, *args, kpt_shape: Tuple[int, int] = (17, 3),
        flip_idx: Optional[Tuple[int, ...]] = None, **kwargs,
    ):
        self.kpt_shape = tuple(kpt_shape)
        # never GUESS a chiral layout from the keypoint count: a non-COCO
        # 17-point skeleton would silently train on mis-swapped pairs. The
        # reference warns and disables fliplr when flip_idx is absent
        # (augment.py:989-994) and raises on a wrong length (:995-996).
        self.flip_idx = tuple(flip_idx) if flip_idx else None
        if self.flip_idx is not None and len(self.flip_idx) != self.kpt_shape[0]:
            raise ValueError(
                f"data.yaml flip_idx has {len(self.flip_idx)} entries but "
                f"kpt_shape is {self.kpt_shape}"
            )
        self._kpts: Dict[int, np.ndarray] = {}
        super().__init__(*args, **kwargs)
        if self.augment and self.flip_idx is None and self.hyp.get("fliplr", 0.0) > 0:
            from ..utils import LOGGER

            LOGGER.warning(
                "no 'flip_idx' in the dataset yaml — setting fliplr=0.0 "
                "(horizontal flip needs the chiral keypoint swap)"
            )
            self.hyp["fliplr"] = 0.0

    def _raw_points(self, i: int) -> np.ndarray:
        """(n, nk, nd) keypoints in raw-image pixels (v passthrough)."""
        if i not in self._kpts:
            self._parse_label_file(i)
        rh, rw = (int(v) for v in self.image_shapes()[i])
        k = self._kpts.get(i)
        nk, nd = self.kpt_shape
        if k is None or not len(k):
            return np.zeros((0, nk, nd), np.float32)
        k = k.copy()
        k[..., 0] *= rw
        k[..., 1] *= rh
        return k

    def _format_points(self, out, labels, points, img_hw) -> None:
        nk, nd = self.kpt_shape
        M = self.max_boxes
        gt_kpts = np.zeros((M, nk, nd), np.float32)
        if points is not None:
            n = min(len(points), M)
            gt_kpts[:n] = points[:n]
        out["gt_kpts"] = gt_kpts

    def _load_labels(self, root):
        # always parse: the npz label cache would lose the keypoint columns
        return [self._parse_label_file(i) for i in range(len(self.im_files))]

    def _parse_label_file(self, i: int) -> np.ndarray:
        nk, nd = self.kpt_shape
        p = Path(self.label_files[i])
        rows, kpts = [], []
        if p.exists():
            for ln in p.read_text().splitlines():
                vals = np.array(ln.split(), np.float32)
                if len(vals) != 5 + nk * nd:
                    continue
                rows.append(vals[:5])
                kpts.append(vals[5:].reshape(nk, nd))
        self._kpts[i] = (
            np.stack(kpts) if kpts else np.zeros((0, nk, nd), np.float32)
        )
        return np.array(rows, np.float32).reshape(-1, 5)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        out = super().__getitem__(i)
        if self.augment:  # train path: gt_kpts already set by _format_points
            return out
        h, w = out["img"].shape[:2]
        nk, nd = self.kpt_shape
        M = self.max_boxes
        gt_kpts = np.zeros((M, nk, nd), np.float32)
        # geometry only — no second decode (review finding): the base
        # __getitem__ already letterboxed the pixels with the same math
        rh, rw = (int(v) for v in self.image_shapes()[i])
        ratio, dw, dh = letterbox_geometry((rh, rw), (h, w), scaleup=False)
        k = self._kpts.get(i, np.zeros((0, nk, nd), np.float32))
        for j, kp in enumerate(k[:M]):
            kp = kp.copy()
            kp[:, 0] = kp[:, 0] * rw * ratio + dw
            kp[:, 1] = kp[:, 1] * rh * ratio + dh
            gt_kpts[j] = kp
        out["gt_kpts"] = gt_kpts
        return out


class ClassificationDataset:
    """root/<class dirs>/images (reference data/dataset.py:227). Emits
    {img (imgsz, imgsz, 3) uint8, gt_labels ()} per sample.

    Train (augment=True) runs the reference's classify_augmentations pipeline
    (random-resized-crop, flips, auto_augment policy / color jitter, random
    erasing — data/classify_aug.py); val runs classify_transforms (shortest-
    edge resize + crop_fraction center crop). Normalization stays in the
    jitted preprocess (the reference's ToTensor/Normalize with mean 0 std 1,
    augment.py:20-21)."""

    def __init__(
        self,
        root,
        imgsz: int = 224,
        augment: bool = False,
        hyp: Optional[Dict] = None,
        seed: int = 0,
        crop_fraction: float = 1.0,
    ):
        from .utils import IMG_FORMATS

        root = Path(root)
        self.classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        self.cls_map = {c: i for i, c in enumerate(self.classes)}
        # class = the top-level directory (images may nest deeper, like
        # torchvision ImageFolder accepts — review finding)
        self.samples = [
            (f, self.cls_map[c])
            for c in self.classes
            for f in sorted((root / c).rglob("*"))
            if f.suffix.lstrip(".").lower() in IMG_FORMATS
        ]
        self.imgsz = (
            int(imgsz) if isinstance(imgsz, (int, float)) else int(max(imgsz))
        )
        self.augment = augment
        self.hyp = dict(hyp) if hyp else {}
        self.crop_fraction = float(crop_fraction or 1.0)
        self.rng = np.random.default_rng(seed)
        self.names = dict(enumerate(self.classes))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        from .classify_aug import classify_train_augment, classify_val_transform

        path, cls = self.samples[i]
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        if self.augment:
            img = classify_train_augment(img, self.imgsz, self.rng, self.hyp)
        else:
            img = classify_val_transform(img, self.imgsz, self.crop_fraction)
        return {
            "img": np.ascontiguousarray(img),
            "gt_labels": np.asarray(cls, np.int32),
        }


class OBBEvalDataset(YOLODataset):
    """DOTA-format OBB labels: `cls x1 y1 x2 y2 x3 y3 x4 y4` normalized
    corner rows (reference data/dataset.py task='obb' + ops
    xyxyxyxy2xywhr). Emits detect keys with gt_bboxes (M, 5) = normalized
    xywh + angle rad, the obb_loss/OBBValidator contract. Train mode flows
    the corner quads through the geometric pipeline and refits xywhr via
    min-area-rect (reference ops.py xyxyxyxy2xywhr's cv2.minAreaRect)."""

    points_kind = "corners"

    def __init__(self, *args, **kwargs):
        self._corners: Dict[int, np.ndarray] = {}
        super().__init__(*args, **kwargs)

    def _raw_points(self, i: int) -> np.ndarray:
        """(n, 4, 2) corner quads in raw-image pixels."""
        if i not in self._corners:
            self._parse_label_file(i)
        rh, rw = (int(v) for v in self.image_shapes()[i])
        c = self._corners.get(i)
        if c is None or not len(c):
            return np.zeros((0, 4, 2), np.float32)
        return c * np.array([rw, rh], np.float32)

    def _format_points(self, out, labels, points, img_hw) -> None:
        import cv2

        h, w = img_hw
        M = self.max_boxes
        gt5 = np.zeros((M, 5), np.float32)
        if points is not None:
            for j, quad in enumerate(points[:M]):
                (cx, cy), (rw, rh), ang = cv2.minAreaRect(
                    quad[..., :2].astype(np.float32)
                )
                gt5[j] = [cx / w, cy / h, rw / w, rh / h, np.deg2rad(ang)]
        out["gt_bboxes"] = gt5

    def _load_labels(self, root):
        return [self._parse_label_file(i) for i in range(len(self.im_files))]

    def _parse_label_file(self, i: int) -> np.ndarray:
        p = Path(self.label_files[i])
        rows, corners = [], []
        if p.exists():
            for ln in p.read_text().splitlines():
                vals = ln.split()
                if len(vals) != 9:
                    continue
                cls = float(vals[0])
                pts = np.array(vals[1:], np.float32).reshape(4, 2)
                x1, y1 = pts.min(0)
                x2, y2 = pts.max(0)
                rows.append([cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                corners.append(pts)
        self._corners[i] = (
            np.stack(corners) if corners else np.zeros((0, 4, 2), np.float32)
        )
        return np.array(rows, np.float32).reshape(-1, 5)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        out = super().__getitem__(i)
        if self.augment:  # train path: xywhr already set by _format_points
            return out
        h, w = out["img"].shape[:2]
        M = self.max_boxes
        # geometry only — no second decode (review finding): the base
        # __getitem__ already letterboxed the pixels with the same math
        rh, rw = (int(v) for v in self.image_shapes()[i])
        ratio, dw, dh = letterbox_geometry((rh, rw), (h, w), scaleup=False)
        gt5 = np.zeros((M, 5), np.float32)
        corners = self._corners.get(i, np.zeros((0, 4, 2), np.float32))[:M]
        for j, pts in enumerate(corners):
            px = pts * np.array([rw, rh], np.float32) * ratio + np.array(
                [dw, dh], np.float32
            )
            c = px.mean(0)
            e1 = px[1] - px[0]
            e2 = px[2] - px[1]
            wr, hr = float(np.linalg.norm(e1)), float(np.linalg.norm(e2))
            ang = float(np.arctan2(e1[1], e1[0]))
            gt5[j] = [c[0] / w, c[1] / h, wr / w, hr / h, ang]
        out["gt_bboxes"] = gt5
        return out


class SemanticDataset:
    """Semantic-segmentation dataset placeholder (the reference ships the
    same empty shell, data/dataset.py:368 ``SemanticDataset``)."""

    def __init__(self):
        pass
