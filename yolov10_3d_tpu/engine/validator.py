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
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            out = self.model.apply(variables, x, train=False)
            if isinstance(out, dict):  # v10 NMS-free dual head
                det = v10_detections(
                    out["one2one"], spec.strides, spec.nc, max_det=max_det
                )
            else:  # plain Detect list output (v8/v9/v5/...): NMS epilogue
                from ..ops.postprocess import v8_detections

                det = v8_detections(
                    out, spec.strides, spec.nc, conf=0.001, max_det=max_det
                )
            return det["boxes"], det["scores"], det["labels"]

        return fwd

    def __call__(
        self,
        variables,
        dataloader,
        conf: float = 0.001,
        max_det: int = 300,
        save_json_path: Optional[str] = None,
        dataset=None,
    ):
        """dataloader yields padded batches {img, gt_labels, gt_bboxes (xywh
        normalized), mask_gt}. Returns metrics dict (mAP50, mAP50-95, fitness).

        save_json_path: write COCO-format predictions.json (reference
        detect/val.py:276 ``pred_to_json``); boxes are in the letterboxed
        model frame, image ids from the dataset's file stems when given
        (int stems become ints, like the reference's COCO id convention)."""
        metrics = DetMetrics(nc=self.spec.nc, names=self.names)
        fwd = self._forward_fn(int(max_det))
        json_records = [] if save_json_path else None
        global_idx = 0  # fallback COCO image id: unique across batches
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
                if json_records is not None:
                    from ..utils.coco import pred_to_json

                    img_id = global_idx
                    if dataset is not None and "im_id" in batch:
                        from pathlib import Path as _P

                        stem = _P(dataset.im_files[int(batch["im_id"][b])]).stem
                        img_id = int(stem) if stem.isnumeric() else stem
                    json_records.extend(
                        pred_to_json(img_id, boxes[b][keep], scores[b][keep], labels[b][keep])
                    )
                global_idx += 1
        if json_records is not None:
            from ..utils.coco import save_json

            save_json(json_records, save_json_path)
        return metrics.results()
