"""3D detection validator (reference: models/yolov10_3D/val.py).

Forward -> decode_detect3d -> top-50 NMS-free select -> undo the affine
augment + backproject via calib -> KITTI txt rows -> official AP40 eval.
Fitness = 3D AP40 moderate @0.7 (reference kitti.py:444-450).
Optional o2m depth aggregation (weighted KDE over IoU>0.9 cluster,
val.py:49-102) is deferred to the use_o2m_depth flag (later round).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.kitti_utils import Calibration
from ..ops.postprocess import decode_detect3d, v10_3d_postprocess
from ..utils.metrics import DetMetrics


class Detection3DValidator:
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
            nl = len(feats)
            preds = decode_detect3d(feats, spec.strides[:nl], spec.nc)
            reg, scores, labels = v10_3d_postprocess(preds, max_det, spec.nc)
            return reg, scores, labels

        return fwd

    def __call__(
        self,
        variables,
        dataset,
        dataloader,
        save_dir: str = "runs/val3d",
        conf_threshold: float = 0.001,
        max_det: int = 50,
    ) -> Dict[str, float]:
        """dataset: KITTIDataset (for calib access + decode + eval).
        dataloader yields padded batches with img/calib/img_id/trans_inv."""
        fwd = self._forward_fn(int(max_det))
        metrics2d = DetMetrics(nc=self.spec.nc, names=self.names)
        all_results: Dict[str, List] = {}
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            reg, scores, labels = (np.asarray(o) for o in fwd(variables, img))
            B = img.shape[0]
            # assemble decode_preds rows: reg(35) + raw score + label
            preds = np.concatenate(
                [reg, scores[..., None], labels[..., None].astype(np.float32)], -1
            )
            img_ids = np.asarray(batch["img_id"]).reshape(-1)
            calibs = [dataset.get_calib(int(i)) for i in img_ids]
            im_files = [f"{int(i):06d}.txt" for i in img_ids]
            inv_trans = np.asarray(batch["trans_inv"])
            results = dataset.decode_preds(
                preds, calibs, im_files, inv_trans, threshold=conf_threshold
            )
            all_results.update(results)

            # 2D mAP bookkeeping in the model frame (reference val.py:114-165)
            H, W = img.shape[1], img.shape[2]
            for b in range(B):
                keep = 1 / (1 + np.exp(-scores[b])) > 0.25
                boxes = reg[b][:, :4][keep]
                mask = np.asarray(batch["mask_gt"][b])
                gt_xywh = np.asarray(batch["gt_bboxes"][b])[mask] * np.array(
                    [W, H, W, H], np.float32
                )
                gt_xyxy = np.concatenate(
                    [gt_xywh[:, :2] - gt_xywh[:, 2:] / 2, gt_xywh[:, :2] + gt_xywh[:, 2:] / 2],
                    -1,
                )
                metrics2d.process_batch(
                    boxes,
                    1 / (1 + np.exp(-scores[b][keep])),
                    labels[b][keep],
                    gt_xyxy,
                    np.asarray(batch["gt_labels"][b])[mask],
                )

        out = metrics2d.results()
        ap3d_moderate = dataset.get_stats(all_results, save_dir)
        out["metrics/3D"] = float(ap3d_moderate)
        out["fitness"] = float(ap3d_moderate)  # Det3dMetrics fitness (metrics.py:896-926)
        return out
