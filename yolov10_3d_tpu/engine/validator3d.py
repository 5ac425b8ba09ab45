"""3D detection validator (reference: models/yolov10_3D/val.py).

Forward -> decode_detect3d -> top-50 NMS-free select -> undo the affine
augment + backproject via calib -> KITTI txt rows -> official AP40 eval.
Fitness = 3D AP40 moderate @0.7 (reference kitti.py:444-450).
Supports the use_o2m_depth flag: the one-to-many branch's depth predictions
are aggregated into the one-to-one detections via a weighted Gaussian KDE
over the IoU>0.9 cluster (reference val.py:78-102 ``aggregate_o2m_preds``).
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
from ..utils.metrics import DetMetrics, box_iou_np


def aggregate_o2m_depth(
    predsO: np.ndarray, predsM: np.ndarray, thres: float = 0.1, grid_points: int = 500
) -> np.ndarray:
    """Refine o2o depths with the o2m cluster (reference val.py:78-102):
    for each o2o det, gather same-class o2m dets with IoU>0.9, weight their
    depths by exp(-sigma), fit a weighted Gaussian KDE (Silverman bandwidth)
    and take the mode over a 500-point grid.

    Fully vectorized over the detection axes (the reference loops python +
    one sklearn KernelDensity fit per detection; this is one einsum per
    image — same mode, since argmax_g sum_k w_k N(g; d_k, h) is invariant
    to the weight normalisation and the 1/h constant sklearn applies).

    preds layout per row: bbox(4) c3d(2) s3d(3) hd(24) dep dep_un score label.
    """
    predsO = predsO.copy()
    B, N = predsO.shape[:2]
    M = predsM.shape[1]
    for i in range(B):
        iou = box_iou_np(predsO[i, :, :4], predsM[i, :, :4])  # (N, M)
        # column 0 = the o2o det itself, columns 1.. = the o2m cluster
        depths = np.concatenate(
            [predsO[i, :, 33:34], np.broadcast_to(predsM[i, :, 33], (N, M))], 1
        )  # (N, M+1)
        uncerts = np.concatenate(
            [predsO[i, :, 34:35], np.broadcast_to(predsM[i, :, 34], (N, M))], 1
        )
        same_cls = np.concatenate(
            [np.ones((N, 1), bool), predsM[i, :, 36][None] == predsO[i, :, 36:37]], 1
        )
        matches = np.concatenate([np.ones((N, 1), bool), iou > 0.9], 1)
        w = np.exp(-uncerts)
        mask = matches & same_cls & (w > thres)
        n = mask.sum(1)
        rows = np.nonzero(n > 1)[0]
        if rows.size == 0:
            continue
        # compact each row to its masked columns only (clusters are tiny
        # next to the o2m det count, so this shrinks the KDE >100x)
        kmax = int(n.max())
        order = np.argsort(~mask[rows], axis=1, kind="stable")[:, :kmax]
        sub_mask = np.take_along_axis(mask[rows], order, 1)  # (R, kmax)
        d = np.where(sub_mask, np.take_along_axis(depths[rows], order, 1), np.nan)
        wv = np.where(sub_mask, np.take_along_axis(w[rows], order, 1), 0.0)
        nr = n[rows].astype(np.float64)
        # Silverman bandwidth exactly as sklearn KernelDensity: h =
        # (n(d+2)/4)^(-1/(d+4)), data-scale-free for d=1 (sklearn _kde.py)
        h = (nr * 3.0 / 4.0) ** (-0.2)  # (R,)
        dmin, dmax = np.nanmin(d, 1), np.nanmax(d, 1)
        grid = dmin[:, None] + (dmax - dmin)[:, None] * np.linspace(0.0, 1.0, grid_points)[None]
        z = (grid[:, :, None] - np.nan_to_num(d)[:, None, :]) / h[:, None, None]
        density = np.einsum("rgk,rk->rg", np.exp(-0.5 * z * z), wv)  # (R, G)
        predsO[i, rows, 33] = np.take_along_axis(
            grid, np.argmax(density, 1)[:, None], 1
        )[:, 0]
    return predsO


class Detection3DValidator:
    def __init__(self, model, spec, args, names=None):
        self.model = model
        self.spec = spec
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}
        self.dino_teacher = None  # lazy, loaded on first use_dino_depth batch

    def _dino_depth_pred(self, preds: np.ndarray, img) -> np.ndarray:
        """Substitute predicted depths with teacher-inferred depths at the
        predicted 3D centers (reference val.py:61-76 ``dino_depth_pred``):
        the frozen DINOv2 depth teacher runs on the val images, and each
        detection's depth (column 33) is replaced by the teacher depth map
        sampled at its projected center (columns 4:6, model-input pixels,
        clamped to the map)."""
        import jax.numpy as jnp

        if self.dino_teacher is None:
            from .trainer3d import Detection3DTrainer

            path = getattr(self.args, "dino_path", None)
            if not path:
                raise ValueError(
                    "use_dino_depth=True requires dino_path to point at a "
                    "saved DinoDepther/dinov2 checkpoint (reference val.py:65)"
                )
            self.dino_teacher = Detection3DTrainer._load_dino_teacher(str(path))
        imgs = jnp.asarray(img)
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        depth_maps = np.asarray(self.dino_teacher(imgs)[0])  # (B, H, W)
        preds = preds.copy()
        H, W = depth_maps.shape[1], depth_maps.shape[2]
        cx = np.clip(preds[..., 4].astype(np.int64), 0, W - 1)
        cy = np.clip(preds[..., 5].astype(np.int64), 0, H - 1)
        b = np.arange(preds.shape[0])[:, None]
        preds[..., 33] = depth_maps[b, cy, cx]
        return preds

    @functools.lru_cache(maxsize=4)
    def _forward_fn(self, max_det: int, with_o2m: bool = False):
        spec = self.spec
        model = self.model
        from ..nn.build import YOLOModel
        from ..nn.heads3d import SPARSE_K

        if (
            not with_o2m  # o2m depth-KDE needs the one2many maps
            and isinstance(model, YOLOModel)
            and spec.head_module == "v10Detect3d"
            and max_det <= SPARSE_K  # off-candidate sparse regression is zero
        ):
            # serving twin (same param tree): skip o2m branches, sparse
            # top-k regression — identical detections, measured +22% e2e
            # at 384x1280 (nn/heads3d.py design note)
            model = YOLOModel(
                spec=spec, fast_eval=True, sparse_eval=True,
                spd_stem=model.spd_stem,
            )

        @jax.jit
        def fwd(variables, x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            out = model.apply(variables, x, train=False)
            feats = out["one2one"]
            nl = len(feats)
            preds = decode_detect3d(feats, spec.strides[:nl], spec.nc)
            reg, scores, labels = v10_3d_postprocess(preds, max_det, spec.nc)
            if not with_o2m:
                return reg, scores, labels
            predsM = decode_detect3d(out["one2many"], spec.strides[:nl], spec.nc)
            regM, scoresM, labelsM = v10_3d_postprocess(predsM, max_det * 5, spec.nc)
            return reg, scores, labels, regM, scoresM, labelsM

        return fwd

    def __call__(
        self,
        variables,
        dataset,
        dataloader,
        save_dir: str = "runs/val3d",
        conf_threshold: float = 0.001,
        max_det: int = 50,
        use_o2m_depth: bool = False,
    ) -> Dict[str, float]:
        """dataset: KITTIDataset (for calib access + decode + eval).
        dataloader yields padded batches with img/calib/img_id/trans_inv."""
        use_o2m_depth = use_o2m_depth or bool(
            getattr(self.args, "use_o2m_depth", False)
        )
        use_dino_depth = bool(getattr(self.args, "use_dino_depth", False))
        fwd = self._forward_fn(int(max_det), use_o2m_depth)
        metrics2d = DetMetrics(nc=self.spec.nc, names=self.names)
        all_results: Dict[str, List] = {}
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            outs = [np.asarray(o) for o in fwd(variables, img)]
            reg, scores, labels = outs[:3]
            B = img.shape[0]
            # assemble decode_preds rows: reg(35) + raw score + label
            preds = np.concatenate(
                [reg, scores[..., None], labels[..., None].astype(np.float32)], -1
            )
            if use_o2m_depth:
                regM, scoresM, labelsM = outs[3:]
                predsM = np.concatenate(
                    [regM, scoresM[..., None], labelsM[..., None].astype(np.float32)], -1
                )
                preds = aggregate_o2m_depth(preds, predsM)
                reg = preds[..., :35]
            elif use_dino_depth:
                # reference val.py:56-58: dino override only when the o2m
                # KDE aggregation is off (elif)
                preds = self._dino_depth_pred(preds, img)
                reg = preds[..., :35]
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
