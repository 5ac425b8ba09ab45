"""Results containers (reference: engine/results.py ``Results``/``Boxes``).

Fixed-shape padded detections with validity masks end-to-end (TPU-friendly);
`.numpy()` views drop the padding on the host.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


class Boxes:
    """Detections for one image: xyxy in ORIGINAL image coords + conf + cls."""

    def __init__(self, data: np.ndarray, orig_shape):
        # data: (n, 6) = x1, y1, x2, y2, conf, cls
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.concatenate([(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], -1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h])

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h])

    def __len__(self):
        return len(self.data)


class Boxes3D(Boxes):
    """3D detections: adds projected center, 3D size, heading, depth columns.

    data: (n, 6 + 10) = x1,y1,x2,y2,conf,cls, cx3d,cy3d, h,w,l, ry, x,y,z, dep_sigma
    """

    @property
    def center_3d_img(self):
        return self.data[:, 6:8]

    @property
    def size_3d(self):
        return self.data[:, 8:11]

    @property
    def ry(self):
        return self.data[:, 11]

    @property
    def xyz(self):
        return self.data[:, 12:15]

    @property
    def depth_sigma(self):
        return self.data[:, 15]


class Masks:
    """Per-detection binary masks (reference results.py ``Masks``)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)  # (N, h, w) bool/uint8
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        """Mask contours as pixel polygons in the stored mask frame (a
        bounding-rect approximation; the reference traces cv2 contours)."""
        polys = []
        for m in self.data:
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                polys.append(np.zeros((0, 2), np.float32))
                continue
            x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
            polys.append(np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32))
        return polys


class Keypoints:
    """Per-detection pose keypoints (reference results.py ``Keypoints``)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)  # (N, nk, 2|3) pixels (+ conf)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] >= 3 else None


class Probs:
    """Classification probabilities (reference results.py ``Probs``)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data).reshape(-1)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(self.data.max())

    @property
    def top5conf(self):
        return np.sort(self.data)[::-1][:5]


class OBBoxes:
    """Rotated detections (reference results.py ``OBB``): rows
    (cx, cy, w, h, r, conf, cls) in original-image pixels."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data).reshape(-1, 7)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """(N, 4, 2) rotated corner points."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx = np.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
        dy = np.stack([h / 2, -h / 2, -h / 2, h / 2], -1)
        x = cx[:, None] + dx * cos[:, None] - dy * sin[:, None]
        y = cy[:, None] + dx * sin[:, None] + dy * cos[:, None]
        return np.stack([x, y], -1)


class Results:
    """Per-image inference result (reference results.py ``Results``)."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str = "",
        names: Optional[Dict[int, str]] = None,
        boxes: Optional[np.ndarray] = None,
        boxes3d: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        keypoints: Optional[np.ndarray] = None,
        probs: Optional[np.ndarray] = None,
        obb: Optional[np.ndarray] = None,
        speed: Optional[Dict[str, float]] = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names or {}
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.boxes3d = (
            Boxes3D(boxes3d, self.orig_shape) if boxes3d is not None else None
        )
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = (
            Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        )
        self.probs = Probs(probs) if probs is not None else None
        self.obb = OBBoxes(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes) if self.boxes is not None else 0

    def summary(self):
        """JSON-ready per-detection dicts, covering every task's payload
        (reference results.py ``summary``: box + optional segments/keypoints;
        extended here with the 3D, OBB, and classify payloads)."""
        out = []
        if self.probs is not None:
            p = self.probs
            return [
                {
                    "name": self.names.get(p.top1, str(p.top1)),
                    "class": p.top1,
                    "confidence": float(p.top1conf),
                }
            ]
        if self.obb is not None:
            o = self.obb
            for i in range(len(o)):
                out.append(
                    {
                        "name": self.names.get(int(o.cls[i]), str(int(o.cls[i]))),
                        "class": int(o.cls[i]),
                        "confidence": float(o.conf[i]),
                        "box": {
                            k: float(v)
                            for k, v in zip("x y w h r".split(), o.xywhr[i])
                        },
                    }
                )
            return out
        b = self.boxes3d if self.boxes3d is not None else self.boxes
        if b is None:
            return out
        for i in range(len(b)):
            row = {
                "name": self.names.get(int(b.cls[i]), str(int(b.cls[i]))),
                "class": int(b.cls[i]),
                "confidence": float(b.conf[i]),
                "box": {k: float(v) for k, v in zip("x1 y1 x2 y2".split(), b.xyxy[i])},
            }
            if self.boxes3d is not None:
                row["box3d"] = {
                    "xyz": [float(v) for v in b.xyz[i]],
                    "hwl": [float(v) for v in b.size_3d[i]],
                    "ry": float(b.ry[i]),
                    "depth_sigma": float(b.depth_sigma[i]),
                }
            if self.keypoints is not None and i < len(self.keypoints):
                row["keypoints"] = {
                    "xy": self.keypoints.xy[i].tolist(),
                    **(
                        {"conf": self.keypoints.conf[i].tolist()}
                        if self.keypoints.conf is not None
                        else {}
                    ),
                }
            if self.masks is not None and i < len(self.masks):
                row["segments"] = {"xy": self.masks.xy[i].tolist()}
            out.append(row)
        return out

    def save_txt(self, txt_file, save_conf: bool = False):
        """YOLO-format txt (reference results.py ``save_txt``)."""
        lines = []
        b = self.boxes
        if b is not None:
            for i in range(len(b)):
                c = int(b.cls[i])
                parts = [str(c)] + [f"{v:.6f}" for v in b.xywhn[i]]
                if save_conf:
                    parts.append(f"{b.conf[i]:.6f}")
                lines.append(" ".join(parts))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return txt_file

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5):
        """Draw boxes onto a copy of the original image (reference
        results.py ``plot``; PIL Annotator backend)."""
        from ..utils.plotting import Annotator, color_for

        b = self.boxes
        if b is None:
            return self.orig_img.copy()
        ann = Annotator(self.orig_img.copy(), line_width, names=self.names)
        for i in range(len(b)):
            c = int(b.cls[i])
            label = f"{self.names.get(c, c)} {b.conf[i]:.2f}"
            ann.box_label(b.xyxy[i], label, color_for(c))
        return ann.result()
