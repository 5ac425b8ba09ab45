"""3D detection trainer (reference: models/yolov10_3D/train.py).

Dispatches the dataset by data-yaml name (KITTI/Waymo/Omni3D, reference
train.py:20-29), swaps the loss for DetectLoss3d, and applies the 3D head
bias init."""

from __future__ import annotations

from pathlib import Path
from typing import Dict

from .trainer import DetectionTrainer


class RTDETRTrainer(DetectionTrainer):
    """RT-DETR trainer (reference models/rtdetr/train.py): YOLO datasets +
    the DETR loss over decoder/encoder outputs, with contrastive denoising
    groups built inside the head (train/cdn.py)."""

    num_denoising = 100  # reference head.py:300 nd

    def make_loss(self, spec):
        from ..train.detr_loss import rtdetr_loss

        nd = self.num_denoising

        def loss_fn(preds, batch):
            # static denoising split, derived from the padded GT size M the
            # same way the head's get_cdn_group does (train/cdn.py)
            M = batch["gt_labels"].shape[1]
            G = max(nd // M, 1)
            D = 2 * G * M
            dn_meta = {
                "dn_num_group": G,
                "dn_num_split": (D, preds["dec_bboxes"].shape[2] - D),
            }
            total, items = rtdetr_loss(preds, batch, dn_meta=dn_meta)
            return total, items

        return loss_fn

    def make_head_kwargs_fn(self, spec):
        import jax

        def fn(batch, step):
            return {
                "gt_cls": batch["gt_labels"],
                "gt_bboxes": batch["gt_bboxes"],
                "gt_mask": batch["mask_gt"],
                "dn_rng": jax.random.fold_in(jax.random.PRNGKey(0), step),
            }

        return fn

    def init_params(self, model, spec, variables):
        return variables  # detr heads keep their default init


class Detection3DTrainer(DetectionTrainer):
    def build_dataset(self, path, mode: str):
        name = str(self.args.data).lower()
        if "kitti" in name:
            from ..data.kitti import KITTIDataset

            return KITTIDataset(
                root=path, split="train" if mode == "train" else "val",
                args=self.args,
            )
        if "waymo" in name:
            from ..data.waymo import WaymoDataset

            return WaymoDataset(root=path, split=mode, args=self.args)
        if "omni" in name:
            from ..data.omni3d import Omni3Dataset

            return Omni3Dataset(root=path, split=mode, args=self.args)
        raise ValueError(f"unknown 3D dataset for {self.args.data!r}")

    def make_loss(self, spec):
        from ..train.loss3d import detect3d_loss

        hyp = self.args.to_dict()

        def loss_fn(preds, batch):
            return detect3d_loss(preds, batch, nc=spec.nc, strides=spec.strides, hyp=hyp)

        return loss_fn

    def init_params(self, model, spec, variables):
        import flax

        from ..nn.heads3d import detect3d_bias_init

        params = flax.core.unfreeze(variables["params"])
        head_key = f"model_{spec.head_index}"
        if head_key in params:
            params[head_key] = detect3d_bias_init(
                params[head_key], spec.nc, spec.strides
            )
        variables = {**variables, "params": params}

        # graft a pretrained 2D backbone into all non-head layers (reference
        # yolov10_3D/train.py:50-62 pulls the HF-hub COCO YOLOv10; offline we
        # take any local checkpoint via args.pretrained="path.ckpt")
        pretrained = self.args.get("pretrained")
        if isinstance(pretrained, str) and pretrained.endswith((".ckpt", ".pt")):
            from ..engine.model import Model
            from ..utils.torch_convert import graft_backbone

            src = Model(pretrained)
            variables = graft_backbone(variables, src.variables, spec.head_index)
        return variables
