"""Task validators: segmentation / pose / OBB / classification (reference:
models/yolo/{segment,pose,obb,classify}/val.py).

Same shape discipline as DetectionValidator: one jitted forward + decode +
fixed-shape NMS per batch (task payloads ride through NMS via the `extra`
column, like the reference concatenates mask coefs / kpts / angle onto the
prediction rows, ops.py:163); matching + metric accumulation in numpy.

Batch contracts (all padded fixed shapes, like the detect loader):
  segment:  img, gt_labels, gt_bboxes (xywh norm), mask_gt,
            gt_masks (B, M, h, w) binary — any resolution; IoU is computed
            at proto resolution (the reference downsamples GT the same way)
  pose:     ... plus gt_kpts (B, M, nk, 2|3) in input pixels
  obb:      gt_bboxes is (B, M, 5) normalized xywh + angle rad
  classify: img, gt_labels (B,)
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import probiou, xyxy2xywh
from ..ops.nms import non_max_suppression
from ..ops.postprocess import (
    decode_detect, decode_kpts, decode_obb_angle, flatten_feats, process_masks,
)
from ..utils.metrics import (
    ClassifyMetrics, OBBMetrics, PoseMetrics, SegmentMetrics,
)


def _gt_xyxy(batch, b, W, H):
    mask = np.asarray(batch["mask_gt"][b])
    xywh = np.asarray(batch["gt_bboxes"][b])[mask][:, :4] * np.array(
        [W, H, W, H], np.float32
    )
    xyxy = np.concatenate([xywh[:, :2] - xywh[:, 2:] / 2, xywh[:, :2] + xywh[:, 2:] / 2], -1)
    return xyxy, np.asarray(batch["gt_labels"][b])[mask], mask


def _resize_nearest(masks: np.ndarray, h: int, w: int) -> np.ndarray:
    """(N, H, W) -> (N, h, w) nearest resize (GT masks to proto res)."""
    if masks.shape[-2:] == (h, w):
        return masks
    ys = (np.arange(h) * masks.shape[-2] / h).astype(int)
    xs = (np.arange(w) * masks.shape[-1] / w).astype(int)
    return masks[..., ys[:, None], xs[None, :]]


class SegmentationValidator:
    """reference models/yolo/segment/val.py ``SegmentationValidator``."""

    def __init__(self, model, spec, args=None, names=None):
        self.model = model
        self.spec = spec
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}

    @functools.lru_cache(maxsize=4)
    def _forward_fn(self, max_det: int, conf: float, iou: float):
        spec = self.spec

        @jax.jit
        def fwd(variables, x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            out = self.model.apply(variables, x, train=False)
            nl = len(out["det"])
            preds = decode_detect(out["det"], spec.strides[:nl], spec.nc)
            preds = jnp.concatenate([xyxy2xywh(preds[..., :4]), preds[..., 4:]], -1)
            mc, _ = flatten_feats(out["mask_coefs"])
            boxes, scores, labels, valid, coefs = non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, extra=mc
            )
            masks = process_masks(
                out["protos"], coefs, boxes, (x.shape[1], x.shape[2])
            )  # (B, K, Hm, Wm) sigmoid probabilities
            return boxes, scores, labels, valid, masks > 0.5

        return fwd

    def __call__(self, variables, dataloader, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300) -> Dict[str, float]:
        metrics = SegmentMetrics(nc=self.spec.nc, names=self.names)
        fwd = self._forward_fn(int(max_det), float(conf), float(iou))
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            boxes, scores, labels, valid, masks = (np.asarray(o) for o in fwd(variables, img))
            H, W = img.shape[1], img.shape[2]
            hm, wm = masks.shape[-2:]
            for b in range(img.shape[0]):
                keep = valid[b] & (scores[b] > conf)
                gt_boxes, gt_cls, mgt = _gt_xyxy(batch, b, W, H)
                gt_masks = _resize_nearest(
                    np.asarray(batch["gt_masks"][b])[mgt].astype(np.float32), hm, wm
                )
                metrics.process_batch_seg(
                    boxes[b][keep], scores[b][keep], labels[b][keep], masks[b][keep],
                    gt_boxes, gt_cls, gt_masks,
                )
        return metrics.results()


class PoseValidator:
    """reference models/yolo/pose/val.py ``PoseValidator``."""

    def __init__(self, model, spec, args=None, names=None, kpt_shape=(17, 3)):
        self.model = model
        self.spec = spec
        self.args = args
        self.kpt_shape = tuple(kpt_shape)
        self.names = names or {i: str(i) for i in range(spec.nc)}

    @functools.lru_cache(maxsize=4)
    def _forward_fn(self, max_det: int, conf: float, iou: float):
        spec = self.spec
        nk, nd = self.kpt_shape

        @jax.jit
        def fwd(variables, x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            out = self.model.apply(variables, x, train=False)
            nl = len(out["det"])
            preds = decode_detect(out["det"], spec.strides[:nl], spec.nc)
            preds = jnp.concatenate([xyxy2xywh(preds[..., :4]), preds[..., 4:]], -1)
            kpts = decode_kpts(out["kpts"], spec.strides[:nl], (nk, nd))
            boxes, scores, labels, valid, kq = non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, extra=kpts
            )
            return boxes, scores, labels, valid, kq.reshape(*kq.shape[:2], nk, nd)

        return fwd

    def __call__(self, variables, dataloader, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300) -> Dict[str, float]:
        metrics = PoseMetrics(nc=self.spec.nc, names=self.names)
        fwd = self._forward_fn(int(max_det), float(conf), float(iou))
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            boxes, scores, labels, valid, kpts = (np.asarray(o) for o in fwd(variables, img))
            H, W = img.shape[1], img.shape[2]
            for b in range(img.shape[0]):
                keep = valid[b] & (scores[b] > conf)
                gt_boxes, gt_cls, mgt = _gt_xyxy(batch, b, W, H)
                gt_kpts = np.asarray(batch["gt_kpts"][b])[mgt]
                metrics.process_batch_pose(
                    boxes[b][keep], scores[b][keep], labels[b][keep], kpts[b][keep],
                    gt_boxes, gt_cls, gt_kpts,
                )
        return metrics.results()


class OBBValidator:
    """reference models/yolo/obb/val.py ``OBBValidator`` — rotated NMS via
    probiou (reference ops.nms_rotated)."""

    def __init__(self, model, spec, args=None, names=None):
        self.model = model
        self.spec = spec
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}

    @functools.lru_cache(maxsize=4)
    def _forward_fn(self, max_det: int, conf: float, iou: float, pre_topk: int = 512):
        spec = self.spec

        @jax.jit
        def fwd(variables, x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            out = self.model.apply(variables, x, train=False)
            nl = len(out["det"])
            preds = decode_detect(out["det"], spec.strides[:nl], spec.nc)  # xyxy + scores
            angle = decode_obb_angle(out["angle"])  # (B, A, 1)
            xywh = xyxy2xywh(preds[..., :4])
            cls_scores = preds[..., 4:]
            scores = cls_scores.max(-1)
            labels = cls_scores.argmax(-1).astype(jnp.int32)
            k = min(pre_topk, scores.shape[1])
            top_scores, idx = jax.lax.top_k(scores, k)
            rbox = jnp.concatenate([xywh, angle], -1)
            rbox = jnp.take_along_axis(rbox, idx[..., None], axis=1)  # (B, k, 5)
            top_labels = jnp.take_along_axis(labels, idx, axis=1)
            conf_ok = top_scores > conf

            def rot_nms(rb, sc, lb, ok):
                pair = probiou(rb[:, None, :], rb[None, :, :])  # (k, k)
                same = lb[:, None] == lb[None, :]
                pair = jnp.where(same, pair, 0.0)
                pair = jnp.where(ok[None, :] & ok[:, None], pair, 0.0)

                def body(i, keepm):
                    row = (pair[i] > iou) & (jnp.arange(k) > i) & keepm[i]
                    return keepm & ~row

                return jax.lax.fori_loop(0, k, body, jnp.ones(k, bool)) & ok

            keep = jax.vmap(rot_nms)(rbox, top_scores, top_labels, conf_ok)
            rank = jnp.where(keep, jnp.arange(k)[None, :], k + 1)
            order = jnp.argsort(rank, axis=1)[:, :max_det]
            o_rbox = jnp.take_along_axis(rbox, order[..., None], axis=1)
            o_scores = jnp.take_along_axis(top_scores, order, axis=1)
            o_labels = jnp.take_along_axis(top_labels, order, axis=1)
            o_valid = jnp.take_along_axis(keep, order, axis=1)
            return o_rbox * o_valid[..., None], o_scores * o_valid, o_labels, o_valid

        return fwd

    def __call__(self, variables, dataloader, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300) -> Dict[str, float]:
        metrics = OBBMetrics(nc=self.spec.nc, names=self.names)
        fwd = self._forward_fn(int(max_det), float(conf), float(iou))
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            rbox, scores, labels, valid = (np.asarray(o) for o in fwd(variables, img))
            H, W = img.shape[1], img.shape[2]
            for b in range(img.shape[0]):
                keep = valid[b] & (scores[b] > conf)
                mgt = np.asarray(batch["mask_gt"][b])
                gt = np.asarray(batch["gt_bboxes"][b])[mgt]  # (M, 5) norm + rad
                gt_rbox = np.concatenate(
                    [gt[:, :4] * np.array([W, H, W, H], np.float32), gt[:, 4:5]], -1
                )
                gt_cls = np.asarray(batch["gt_labels"][b])[mgt]
                metrics.process_batch(
                    rbox[b][keep], scores[b][keep], labels[b][keep], gt_rbox, gt_cls
                )
        return metrics.results()


class ClassificationValidator:
    """reference models/yolo/classify/val.py ``ClassificationValidator``."""

    def __init__(self, model, spec=None, args=None, names=None):
        self.model = model
        self.spec = spec
        self.args = args
        self.names = names or {}

    @functools.lru_cache(maxsize=2)
    def _forward_fn(self):
        @jax.jit
        def fwd(variables, x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            logits = self.model.apply(variables, x, train=False)
            k = min(5, logits.shape[-1])
            _, top = jax.lax.top_k(logits, k)
            if k < 5:  # pad to the fixed (B, 5) contract
                top = jnp.pad(top, ((0, 0), (0, 5 - k)), constant_values=-1)
            return top

        return fwd

    def __call__(self, variables, dataloader) -> Dict[str, float]:
        metrics = ClassifyMetrics()
        fwd = self._forward_fn()
        for batch in dataloader:
            top5 = np.asarray(fwd(variables, jnp.asarray(batch["img"])))
            metrics.process_batch(top5, np.asarray(batch["gt_labels"]))
        return metrics.results()


class RTDETRValidator:
    """reference models/rtdetr/val.py ``RTDETRValidator`` — query decode,
    no NMS; boxes are normalized cxcywh, scores are per-class sigmoid."""

    def __init__(self, model, spec, args=None, names=None):
        self.model = model
        self.spec = spec
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}

    @functools.lru_cache(maxsize=4)
    def _forward_fn(self, max_det: int):
        from ..ops.boxes import xywh2xyxy

        @jax.jit
        def fwd(variables, x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            out = self.model.apply(variables, x, train=False)
            pred = out["pred"] if isinstance(out, dict) else out
            H, W = x.shape[1], x.shape[2]
            boxes = xywh2xyxy(pred[..., :4] * jnp.asarray([W, H, W, H], jnp.float32))
            scores = jax.nn.sigmoid(pred[..., 4:].astype(jnp.float32))
            B, nq, nc = scores.shape
            k = min(max_det, nq * nc)
            top, idx = jax.lax.top_k(scores.reshape(B, -1), k)
            labels = idx % nc
            boxes = jnp.take_along_axis(boxes, (idx // nc)[..., None], axis=1)
            return boxes, top, labels

        return fwd

    def __call__(self, variables, dataloader, conf: float = 0.001,
                 max_det: int = 300) -> Dict[str, float]:
        from ..utils.metrics import DetMetrics

        metrics = DetMetrics(nc=self.spec.nc, names=self.names)
        fwd = self._forward_fn(int(max_det))
        for batch in dataloader:
            img = jnp.asarray(batch["img"])
            boxes, scores, labels = (np.asarray(o) for o in fwd(variables, img))
            H, W = img.shape[1], img.shape[2]
            for b in range(img.shape[0]):
                keep = scores[b] > conf
                gt_boxes, gt_cls, _ = _gt_xyxy(batch, b, W, H)
                metrics.process_batch(
                    boxes[b][keep], scores[b][keep], labels[b][keep], gt_boxes, gt_cls
                )
        return metrics.results()
