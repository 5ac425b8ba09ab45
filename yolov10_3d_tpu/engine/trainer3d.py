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

    # single source of truth for the denoising budget: the head's constant
    # (a drifting local copy would silently mis-slice dn_num_split)
    from ..nn.rtdetr_head import DEFAULT_NUM_DENOISING as num_denoising

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


def build_3d_dataset(data_name, path, mode: str, args):
    """Dataset dispatch by data-yaml name (reference yolov10_3D/train.py:20-29)."""
    name = str(data_name).lower()
    split = ("train" if mode == "train" else "val")
    if "kitti" in name:
        from ..data.kitti import KITTIDataset

        return KITTIDataset(root=path, split=split, args=args)
    if "waymo" in name:
        from ..data.waymo import WaymoDataset

        return WaymoDataset(root=path, split=mode, args=args)
    if "omni" in name:
        from ..data.omni3d import Omni3Dataset

        return Omni3Dataset(root=path, split=mode, args=args)
    raise ValueError(f"unknown 3D dataset for {data_name!r}")


class Detection3DTrainer(DetectionTrainer):
    """3D trainer: KITTI-family datasets, dual 3D loss, Detection3DValidator
    per-epoch val with AP40 fitness (reference models/yolov10_3D/train.py +
    val.py:183), HTL per-epoch loss weighting (reference trainer.py:349-358),
    optional FGDM and teacher-pluggable distillation losses.
    """

    #: optional frozen depth teacher: callable imgs(B,H,W,3 fp32)->(B,Ht,Wt,C)
    #: np embeddings (the reference hardwires DINOv2 via torch.hub, dino.py:70;
    #: offline we accept any callable — set trainer.teacher before train())
    teacher = None

    def build_dataset(self, path, mode: str):
        return build_3d_dataset(self.args.data, path, mode, self.args)

    def get_validator(self, names):
        from .validator3d import Detection3DValidator

        return Detection3DValidator(self.model, self.spec, self.args, names)

    def run_val(self, state, val_ds, batch_size: int) -> Dict:
        from ..data.dataset import DataLoader
        from ..train.state import eval_variables

        val_loader = DataLoader(
            val_ds, batch_size, shuffle=False, drop_last=False,
            num_threads=self.args.workers,
        )
        return self.validator(
            eval_variables(state), val_ds, val_loader,
            save_dir=str(self.save_dir / "val"),
        )

    # -- HTL (reference trainer.py:349-358,399-400) --
    def epoch_batch_extras(self, epoch: int) -> Dict:
        if not getattr(self.args, "htl", False):
            return {}
        import numpy as np

        from ..train.htl import HierarchicalTaskLearning, ITEM_KEYS

        if not hasattr(self, "_htl"):
            self._htl = HierarchicalTaskLearning(max_epochs=int(self.args.epochs))
            # epoch-0 weights: roots only, normalized (htl.py:28-34)
            self._htl_weights = self._htl.compute_weight(
                np.zeros(len(ITEM_KEYS)), 0
            )
            self._htl.past_losses.clear()
        return {"htl_weights": self._htl_weights}

    def extra_ckpt_meta(self) -> Dict:
        if not hasattr(self, "_htl"):
            return {}
        return {
            "htl_state": self._htl.state_dict(),
            "htl_epoch": int(getattr(self, "_htl_epoch", 0)),
            "htl_weights": [float(v) for v in self._htl_weights],
        }

    def on_resume_meta(self, meta: Dict):
        """Continue the HTL ramp across resume instead of restarting it at
        root-only weights (review finding)."""
        if not meta.get("htl_state") or not getattr(self.args, "htl", False):
            return
        import numpy as np

        from ..train.htl import HierarchicalTaskLearning

        self._htl = HierarchicalTaskLearning(max_epochs=int(self.args.epochs))
        self._htl.load_state_dict(meta["htl_state"])
        self._htl_epoch = int(meta.get("htl_epoch", 0))
        self._htl_weights = np.asarray(meta.get("htl_weights"), np.float32)

    def on_epoch_losses(self, items: Dict):
        if hasattr(self, "_htl"):
            from ..train.htl import ITEM_KEYS

            vec = [items.get(k, 0.0) for k in ITEM_KEYS]
            self._htl_epoch = getattr(self, "_htl_epoch", 0) + 1
            self._htl_weights = self._htl.compute_weight(vec, self._htl_epoch)

    def transform_batch(self, b: Dict) -> Dict:
        if self.teacher is not None:
            import numpy as np

            b = dict(b)
            img = np.asarray(b["img"])
            if img.dtype == np.uint8:  # datasets emit uint8 (H2D path); the
                img = img.astype(np.float32) / 255.0  # teacher contract is fp32 [0,1]
            out = self.teacher(img)
            # two teacher contracts coexist: embeddings-only, or the
            # reference DinoDepther's (depth_maps, embeddings) tuple
            # (utils/dino.py forward; models/dino.py make_dino_teacher)
            if isinstance(out, (tuple, list)):
                out = out[-1]
            b["teacher_embeddings"] = np.asarray(out)
        return b

    @staticmethod
    def _load_dino_teacher(path: str):
        """``dino_path`` -> frozen depth teacher (reference val.py:65 /
        loss.py:1145 ``self.dino_model.load(self.args.dino_path)``).

        Accepts the reference DinoDepther ``.save()`` layout — a torch
        state_dict with ``backbone.*`` (public dinov2 names) and ``head.*``
        keys — or a bare dinov2 backbone state_dict, as ``.pt`` or ``.npz``.
        The backbone converts exactly (``convert_dinov2_state_dict``); the
        1x1-conv depth head maps when its keys are recognizable, else stays
        at init with a warning (the distillation signal — embeddings — is
        backbone-only either way)."""
        import numpy as np

        import jax
        import jax.numpy as jnp

        from ..models.dino import (
            DINOV2_ARCHS, DinoDepther, convert_dinov2_state_dict,
            make_dino_teacher,
        )
        from ..utils import LOGGER

        if str(path).endswith(".npz"):
            sd = {k: np.asarray(v) for k, v in np.load(path).items()}
        else:
            import torch

            raw = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(raw, dict) and "state_dict" in raw:
                raw = raw["state_dict"]
            sd = {
                k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
                for k, v in raw.items()
            }
        bb = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
        if not bb:
            bb = sd  # bare dinov2 backbone checkpoint (torch.hub layout)
        dim = int(np.asarray(bb["cls_token"]).shape[-1])
        size = next(
            (n for n, a in DINOV2_ARCHS.items() if a["embed_dim"] == dim), None
        )
        if size is None:
            raise ValueError(
                f"dino_path embed_dim {dim} matches no DINOv2 arch "
                f"({ {n: a['embed_dim'] for n, a in DINOV2_ARCHS.items()} })"
            )
        model = DinoDepther(backbone_size=size)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
        )
        params = dict(variables["params"])
        params["backbone"] = convert_dinov2_state_dict(bb, size)
        head = {k[len("head."):]: np.asarray(v) for k, v in sd.items() if k.startswith("head.")}
        if head:
            try:
                batch_stats = jax.device_get(variables.get("batch_stats", {}))
                hp = dict(params["head"])
                hp["conv_depth"] = {
                    "kernel": head["conv_depth.weight"].transpose(2, 3, 1, 0),
                    "bias": head["conv_depth.bias"],
                }
                hp["bn"] = {"scale": head["bn.weight"], "bias": head["bn.bias"]}
                batch_stats = dict(batch_stats)
                batch_stats["head"] = {"bn": {
                    "mean": head["bn.running_mean"], "var": head["bn.running_var"],
                }}
                params["head"] = hp
                variables = {"params": params, "batch_stats": batch_stats}
            except KeyError as e:
                LOGGER.warning(
                    f"dino_path head keys not recognized ({e}); depth head "
                    "stays at init (embeddings are unaffected)"
                )
                variables = {**variables, "params": params}
        else:
            variables = {**variables, "params": params}
        LOGGER.info(f"dino teacher loaded from {path} (dinov2 {size})")
        return make_dino_teacher(variables, backbone_size=size)

    def make_loss(self, spec):
        from ..train.loss3d import detect3d_loss

        hyp = self.args.to_dict()

        fgdm_loss_fn = None
        if hyp.get("fgdm_loss"):
            import functools

            from ..train.fgdm import foreground_depth_map_loss

            fgdm_loss_fn = functools.partial(
                foreground_depth_map_loss,
                depth_min=float(hyp.get("min_depth_threshold", 1.0)),
                depth_max=float(hyp.get("max_depth_threshold", 120.0)),
            )

        if (
            (hyp.get("distillation") or hyp.get("fgdm_supervision"))
            and self.teacher is None
            and hyp.get("dino_path")
        ):
            # cfg-driven teacher: dino_path names a saved DINOv2 state dict
            # (the reference hardwires torch.hub dinov2, utils/dino.py:70;
            # offline we load the same weights from disk instead)
            self.teacher = self._load_dino_teacher(str(hyp["dino_path"]))
        if (hyp.get("distillation") or hyp.get("fgdm_supervision")) and self.teacher is None:
            from ..utils import LOGGER

            LOGGER.warning(
                "distillation/fgdm_supervision configured but no teacher is "
                "set — pass Model.train(teacher=...), set trainer.teacher, "
                "or point dino_path at a saved DINOv2 state dict; "
                "the distillation terms are SKIPPED this run"
            )
        head_distill_fn = None
        if hyp.get("distillation") and self.teacher is not None:
            import jax.numpy as jnp

            from ..train.distill import supervision_head_loss

            def head_distill_fn(preds, batch, aux):
                embs = [e for e in preds["o2m_embs"] if e is not None]
                if not embs:
                    raise ValueError(
                        "distillation=True needs depth-branch embeddings, but "
                        "this head config exposes none (common_head: true "
                        "skips them — use the standard per-branch head)"
                    )
                pred_emb = jnp.concatenate(
                    [e.reshape(e.shape[0], -1, e.shape[-1]) for e in embs], axis=1
                )
                h, w = batch["img"].shape[1], batch["img"].shape[2]
                return supervision_head_loss(
                    batch["teacher_embeddings"].astype(jnp.float32),
                    pred_emb,
                    batch["gt_center_3d"],
                    aux["target_gt_idx"],
                    aux["fg_mask"],
                    batch["mask_gt"],
                    batch["mixed"].astype(bool),
                    (h, w),
                    criterion=str(hyp.get("distillation_loss", "soft")),
                    T=float(hyp.get("distillation_temp", 2.0)),
                    weight=float(hyp.get("distillation_weight", 0.75)),
                    no_mixup=bool(hyp.get("distillation_no_mixup", True)),
                )

        fgdm_sup_fn = None
        if hyp.get("fgdm_supervision") and self.teacher is not None:
            import jax.numpy as jnp

            from ..train.distill import supervision_fgdm_loss

            def fgdm_sup_fn(preds, batch, aux):
                # reference loss.py:1191-1211 forward_fgdm: distill the
                # DepthPredictor embeddings toward the frozen teacher on
                # foreground-depth pixels (needs fgdm_predictor: true +
                # load_depth_maps targets)
                if "depth_maps" not in preds:
                    raise ValueError(
                        "fgdm_supervision=True requires fgdm_predictor: true "
                        "in the model yaml (no depth_maps in the head output)"
                    )
                return supervision_fgdm_loss(
                    batch["teacher_embeddings"].astype(jnp.float32),
                    preds["depth_maps"][2],
                    batch["depth_map"],
                    criterion=str(hyp.get("distillation_loss", "soft")),
                    T=float(hyp.get("distillation_temp", 2.0)),
                    weight=float(hyp.get("fgdm_supervision_weight", 1.0) or 1.0),
                )

        distill_fn = None
        parts = [f for f in (head_distill_fn, fgdm_sup_fn) if f is not None]
        if parts:
            def distill_fn(preds, batch, aux):
                total = 0.0
                for f in parts:
                    total = total + f(preds, batch, aux)
                return total

        def loss_fn(preds, batch):
            return detect3d_loss(
                preds, batch, nc=spec.nc, strides=spec.strides, hyp=hyp,
                fgdm_loss_fn=fgdm_loss_fn, distill_fn=distill_fn,
            )

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
