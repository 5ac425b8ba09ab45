"""Task trainers: v8-detect / segmentation / pose / OBB / classification
(reference: models/yolo/{detect,segment,pose,obb,classify}/train.py via the
task_map trainer slot).

Each subclass swaps the three task_map factories on DetectionTrainer:
dataset, loss, validator. Seg/pose/obb train through the full geometric
augmentation pipeline (mosaic/perspective/copy-paste/flip) with instance
polygons/keypoints/corners transformed alongside boxes (data/augment.py;
round-3 — closes the letterbox-only gap)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .trainer import DetectionTrainer


class V8DetectionTrainer(DetectionTrainer):
    """Plain Detect heads (v8/v9/v6/v5/World): single-assignment TAL loss
    (reference v8DetectionLoss) instead of the v10 dual loss."""

    def make_loss(self, spec):
        from ..train.loss import detection_loss

        gains = (self.args.box, self.args.cls, self.args.dfl)

        def loss_fn(preds, batch):
            feats = preds.get("one2one", preds) if isinstance(preds, dict) else preds
            loss, aux = detection_loss(
                feats, batch, nc=spec.nc, strides=spec.strides, gains=gains
            )
            return loss, {"box": aux.box, "cls": aux.cls, "dfl": aux.dfl}

        return loss_fn


class _PointsTaskTrainer(V8DetectionTrainer):
    """Shared base for tasks whose datasets carry instance point sets: the
    device-aug tiles path has no points channel, so it is force-disabled
    (the host pipeline augments points exactly; review fix — device_aug=True
    used to KeyError on batch['tiles'] inside the jitted step)."""

    def _device_aug_active(self) -> bool:
        if self.args.get("device_aug"):
            from ..utils import LOGGER

            LOGGER.warning(
                "device_aug=True ignored for seg/pose/obb: instance "
                "polygons/keypoints ride the host pipeline"
            )
        return False


class SegmentationTrainer(_PointsTaskTrainer):
    """reference models/yolo/segment/train.py ``SegmentationTrainer``."""

    def build_dataset(self, path, mode: str):
        from ..data.dataset_tasks import SegmentationEvalDataset

        return SegmentationEvalDataset(
            path, imgsz=self.args.imgsz, augment=(mode == "train"),
            hyp=self.args.to_dict(), single_cls=self.args.single_cls,
            seed=self.args.seed, cache=self.args.get("cache") or None,
            fraction=self.args.fraction if mode == "train" else 1.0,
        )

    def make_loss(self, spec):
        from ..train.loss_tasks import segmentation_loss

        gains = (self.args.box, self.args.cls, self.args.dfl)

        def loss_fn(preds, batch):
            return segmentation_loss(
                preds, batch, nc=spec.nc, strides=spec.strides, gains=gains
            )

        return loss_fn

    def get_validator(self, names):
        from .validator_tasks import SegmentationValidator

        return SegmentationValidator(self.model, self.spec, self.args, names)


class PoseTrainer(_PointsTaskTrainer):
    """reference models/yolo/pose/train.py ``PoseTrainer``."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        # resolved once: make_loss/get_validator capture it, so it must be
        # final before any factory runs (not re-read per build_dataset call)
        try:
            from ..cfg import load_dataset_yaml

            d = load_dataset_yaml(self.args.data)
            self.kpt_shape = tuple(d.get("kpt_shape", (17, 3)))
            fi = d.get("flip_idx")
            self.flip_idx = tuple(fi) if fi is not None else None
        except Exception:
            self.kpt_shape = (17, 3)
            self.flip_idx = None

    def build_dataset(self, path, mode: str):
        from ..data.dataset_tasks import PoseEvalDataset

        return PoseEvalDataset(
            path, imgsz=self.args.imgsz, augment=(mode == "train"),
            hyp=self.args.to_dict(), kpt_shape=self.kpt_shape,
            flip_idx=self.flip_idx,
            single_cls=self.args.single_cls, seed=self.args.seed,
            cache=self.args.get("cache") or None,
            fraction=self.args.fraction if mode == "train" else 1.0,
        )

    def make_loss(self, spec):
        from ..train.loss_tasks import pose_loss

        gains = (self.args.box, self.args.cls, self.args.dfl)
        imgsz = self.args.imgsz
        kpt_shape = self.kpt_shape

        def loss_fn(preds, batch):
            # dataset emits pixel kpts (validator contract); the loss wants
            # normalized coords (reference v8PoseLoss batch["keypoints"])
            kpts = batch["gt_kpts"].astype(jnp.float32)
            norm = kpts.at[..., 0].divide(imgsz).at[..., 1].divide(imgsz)
            b = {**batch, "gt_kpts": norm}
            return pose_loss(
                preds, b, nc=spec.nc, strides=spec.strides,
                kpt_shape=kpt_shape, gains=gains,
                pose_gain=self.args.get("pose", 12.0) or 12.0,
                kobj_gain=self.args.get("kobj", 1.0) or 1.0,
            )

        return loss_fn

    def get_validator(self, names):
        from .validator_tasks import PoseValidator

        return PoseValidator(
            self.model, self.spec, self.args, names, kpt_shape=self.kpt_shape
        )


class OBBTrainer(_PointsTaskTrainer):
    """reference models/yolo/obb/train.py ``OBBTrainer`` — labels in DOTA
    corner format (cls + 4 normalized xy pairs), converted to xywhr."""

    def build_dataset(self, path, mode: str):
        from ..data.dataset_tasks import OBBEvalDataset

        return OBBEvalDataset(
            path, imgsz=self.args.imgsz, augment=(mode == "train"),
            hyp=self.args.to_dict(), single_cls=self.args.single_cls,
            seed=self.args.seed, cache=self.args.get("cache") or None,
            fraction=self.args.fraction if mode == "train" else 1.0,
        )

    def make_loss(self, spec):
        from ..train.loss_tasks import obb_loss

        gains = (self.args.box, self.args.cls, self.args.dfl)

        def loss_fn(preds, batch):
            return obb_loss(preds, batch, nc=spec.nc, strides=spec.strides, gains=gains)

        return loss_fn

    def get_validator(self, names):
        from .validator_tasks import OBBValidator

        return OBBValidator(self.model, self.spec, self.args, names)


class ClassificationTrainer(DetectionTrainer):
    """reference models/yolo/classify/train.py ``ClassificationTrainer``."""

    def build_dataset(self, path, mode: str):
        from ..data.dataset_tasks import ClassificationDataset

        a = self.args
        return ClassificationDataset(
            path,
            imgsz=a.imgsz,
            augment=(mode == "train"),
            # the reference threads these args into classify_augmentations /
            # classify_transforms (dataset.py:268-283)
            hyp={
                k: a.get(k)
                for k in (
                    "scale", "fliplr", "flipud", "auto_augment",
                    "hsv_h", "hsv_s", "hsv_v", "erasing",
                )
            },
            seed=int(a.get("seed", 0) or 0),
            crop_fraction=float(a.get("crop_fraction", 1.0) or 1.0),
        )

    def init_params(self, model, spec, variables):
        return variables  # no detect bias init on a Linear classifier head

    def make_loss(self, spec):
        from ..train.loss_tasks import classification_loss

        def loss_fn(preds, batch):
            return classification_loss(preds, batch["gt_labels"])

        return loss_fn

    def get_validator(self, names):
        from .validator_tasks import ClassificationValidator

        return ClassificationValidator(self.model, self.spec, self.args, names)


TASK_TRAINERS: Dict[str, type] = {
    "Detect": V8DetectionTrainer,
    "WorldDetect": V8DetectionTrainer,
    "Segment": SegmentationTrainer,
    "Pose": PoseTrainer,
    "OBB": OBBTrainer,
    "Classify": ClassificationTrainer,
}
