"""Vectorized label containers (reference: utils/instance.py ``Bboxes`` /
``Instances``) — format-tracked box arrays used by the augmentation pipeline."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

FORMATS = ("xyxy", "xywh", "ltwh")


def _xyxy2xywh(x):
    y = x.copy()
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def _xywh2xyxy(x):
    y = x.copy()
    half_w, half_h = x[..., 2] / 2, x[..., 3] / 2
    y[..., 0] = x[..., 0] - half_w
    y[..., 1] = x[..., 1] - half_h
    y[..., 2] = x[..., 0] + half_w
    y[..., 3] = x[..., 1] + half_h
    return y


def _ltwh2xyxy(x):
    y = x.copy()
    y[..., 2] = x[..., 2] + x[..., 0]
    y[..., 3] = x[..., 3] + x[..., 1]
    return y


_CONVERT = {
    ("xyxy", "xywh"): _xyxy2xywh,
    ("xywh", "xyxy"): _xywh2xyxy,
    ("ltwh", "xyxy"): _ltwh2xyxy,
    ("xyxy", "ltwh"): lambda x: np.concatenate(
        [x[..., :2], x[..., 2:] - x[..., :2]], -1
    ),
}


class Bboxes:
    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in FORMATS, format
        self.bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
        self.format = format

    def convert(self, format: str):
        if format == self.format:
            return
        if (self.format, format) in _CONVERT:
            self.bboxes = _CONVERT[(self.format, format)](self.bboxes)
        else:  # go via xyxy
            self.convert("xyxy")
            self.bboxes = _CONVERT[("xyxy", format)](self.bboxes)
        self.format = format

    def areas(self) -> np.ndarray:
        b = Bboxes(self.bboxes.copy(), self.format)
        b.convert("xyxy")
        return (b.bboxes[:, 2] - b.bboxes[:, 0]) * (b.bboxes[:, 3] - b.bboxes[:, 1])

    def mul(self, scale):
        if not hasattr(scale, "__len__"):
            scale = (scale,) * 4
        self.bboxes *= np.asarray(scale, np.float32)

    def add(self, offset):
        if not hasattr(offset, "__len__"):
            offset = (offset,) * 4
        self.bboxes += np.asarray(offset, np.float32)

    def __len__(self):
        return len(self.bboxes)


class Instances:
    """Boxes + optional segments/keypoints moving together through augments."""

    def __init__(
        self,
        bboxes: np.ndarray,
        segments: Optional[List[np.ndarray]] = None,
        keypoints: Optional[np.ndarray] = None,
        bbox_format: str = "xywh",
        normalized: bool = True,
    ):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = segments if segments is not None else []
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    def convert_bbox(self, format: str):
        self._bboxes.convert(format)

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def scale(self, scale_w, scale_h, bbox_only=False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if bbox_only:
            return
        self.segments = [s * [scale_w, scale_h] for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] *= scale_w
            self.keypoints[..., 1] *= scale_h

    def denormalize(self, w, h):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w, h):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw, padh):
        assert not self.normalized
        self._bboxes.add((padw, padh, padw, padh))
        self.segments = [s + [padw, padh] for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h):
        self.convert_bbox("xyxy")
        y1 = self.bboxes[:, 1].copy()
        self._bboxes.bboxes[:, 1] = h - self.bboxes[:, 3]
        self._bboxes.bboxes[:, 3] = h - y1
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w):
        self.convert_bbox("xyxy")
        x1 = self.bboxes[:, 0].copy()
        self._bboxes.bboxes[:, 0] = w - self.bboxes[:, 2]
        self._bboxes.bboxes[:, 2] = w - x1
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        self._bboxes.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self._bboxes.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes.bboxes = self.bboxes[good]
            self.segments = [s for s, g in zip(self.segments, good) if g]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def __len__(self):
        return len(self._bboxes)
