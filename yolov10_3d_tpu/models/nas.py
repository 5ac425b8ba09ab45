"""YOLO-NAS facade (reference: models/nas/model.py ``NAS``).

The reference wraps super-gradients' pretrained YOLO-NAS networks (an
external package downloading external weights — neither available offline).
The architecture itself is not defined in the reference repo, so this facade
accepts a converted checkpoint of ANY framework model plus the NAS
postprocessing convention (raw (boxes, scores) pairs through class-agnostic
NMS, reference models/nas/predict.py) and raises an actionable error for the
named pretrained variants.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

PRETRAINED = ("yolo_nas_s", "yolo_nas_m", "yolo_nas_l")


class NAS:
    def __init__(self, model: str = "yolo_nas_s.pt"):
        stem = Path(str(model)).stem
        if stem in PRETRAINED and not Path(model).exists():
            raise RuntimeError(
                f"{stem} weights come from the super-gradients package "
                "(unavailable offline). Convert a checkpoint to .ckpt and "
                "pass its path, or use the yolov10/yolov8 families."
            )
        from ..engine.model import Model

        self._model = Model(str(model))

    def predict(self, source, **kwargs):
        return self._model.predict(source, **kwargs)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    @staticmethod
    def postprocess_raw(boxes: np.ndarray, scores: np.ndarray, iou: float = 0.7,
                        conf: float = 0.25, max_det: int = 300):
        """NAS raw-output epilogue (reference nas/predict.py): xyxy boxes +
        per-class scores -> thresholded, class-assigned, NMS-suppressed."""
        from ..ops.nms import nms_numpy

        cls = scores.argmax(-1)
        sc = scores.max(-1)
        keep = sc >= conf
        boxes, sc, cls = boxes[keep], sc[keep], cls[keep]
        order = nms_numpy(boxes, sc, iou)[:max_det]
        return boxes[order], sc[order], cls[order]
