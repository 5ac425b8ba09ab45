"""Eval-mode datasets for the segmentation / pose / classification tasks
(reference: data/dataset.py ``YOLODataset(task=...)`` parses segment and
keypoint label columns; ``ClassificationDataset``:227).

Letterbox-only loading with padded fixed shapes (the train-side seg/pose
augmentation stack is a documented gap; these make `Model.val()` and
prediction work on real YOLO-format seg/pose datasets)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from .dataset import YOLODataset
from .preprocess import letterbox_geometry
from .utils import polygon2mask


class SegmentationEvalDataset(YOLODataset):
    """YOLO segment labels: `cls x1 y1 x2 y2 ...` normalized polygon rows.
    Emits detect keys + gt_masks (M, mask_h, mask_w) binary, built from the
    letterboxed polygons (reference Format(mask=True), augment.py:876)."""

    def __init__(self, *args, mask_ratio: int = 4, **kwargs):
        self.mask_ratio = mask_ratio
        self._segments: Dict[int, list] = {}
        super().__init__(*args, **kwargs)

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
    Emits detect keys + gt_kpts (M, nk, 2|3) in letterboxed input pixels."""

    def __init__(self, *args, kpt_shape: Tuple[int, int] = (17, 3), **kwargs):
        self.kpt_shape = tuple(kpt_shape)
        self._kpts: Dict[int, np.ndarray] = {}
        super().__init__(*args, **kwargs)

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
    {img (imgsz, imgsz, 3) uint8, gt_labels ()} per sample."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False):
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
        self.imgsz = imgsz
        self.augment = augment
        self.names = dict(enumerate(self.classes))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        path, cls = self.samples[i]
        img = Image.open(path).convert("RGB").resize((self.imgsz, self.imgsz))
        return {
            "img": np.asarray(img, np.uint8),
            "gt_labels": np.asarray(cls, np.int32),
        }


class OBBEvalDataset(YOLODataset):
    """DOTA-format OBB labels: `cls x1 y1 x2 y2 x3 y3 x4 y4` normalized
    corner rows (reference data/dataset.py task='obb' + ops
    xyxyxyxy2xywhr). Emits detect keys with gt_bboxes (M, 5) = normalized
    xywh + angle rad, the obb_loss/OBBValidator contract."""

    def __init__(self, *args, **kwargs):
        self._corners: Dict[int, np.ndarray] = {}
        super().__init__(*args, **kwargs)

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
