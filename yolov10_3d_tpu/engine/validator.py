"""Detection validator (reference: engine/validator.py ``BaseValidator`` +
models/yolov10/val.py): batched forward + NMS-free postprocess + greedy IoU
matching over 10 thresholds -> mAP.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.postprocess import v10_detections
from ..utils.metrics import DetMetrics


class DetectionValidator:
    def __init__(self, model, spec, args, names=None):
        self.model = model
        self.spec = spec
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}

    @functools.lru_cache(maxsize=4)
    def _forward_fn(self, max_det: int):
        spec = self.spec

        @jax.jit
        def fwd(variables, x):
            feats = self.model.apply(variables, x, train=False)["one2one"]
            det = v10_detections(feats, spec.strides, spec.nc, max_det=max_det)
            return det["boxes"], det["scores"], det["labels"]

        return fwd

    def __call__(self, variables, dataloader, conf: float = 0.001, max_det: int = 300):
        """dataloader yields padded batches {img, gt_labels, gt_bboxes (xywh
        normalized), mask_gt}. Returns metrics dict (mAP50, mAP50-95, fitness)."""
        metrics = DetMetrics(nc=self.spec.nc, names=self.names)
        fwd = self._forward_fn(int(max_det))
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            boxes, scores, labels = (np.asarray(o) for o in fwd(variables, img))
            B, H, W = img.shape[0], img.shape[1], img.shape[2]
            for b in range(B):
                keep = scores[b] > conf
                mask = np.asarray(batch["mask_gt"][b])
                gt_xywh = np.asarray(batch["gt_bboxes"][b])[mask] * np.array(
                    [W, H, W, H], np.float32
                )
                gt_xyxy = np.concatenate(
                    [gt_xywh[:, :2] - gt_xywh[:, 2:] / 2, gt_xywh[:, :2] + gt_xywh[:, 2:] / 2], -1
                )
                gt_cls = np.asarray(batch["gt_labels"][b])[mask]
                metrics.process_batch(
                    boxes[b][keep], scores[b][keep], labels[b][keep], gt_xyxy, gt_cls
                )
        return metrics.results()
