"""User-facing model facade (reference: engine/model.py ``Model``,
models/yolov10/model.py ``YOLOv10``, models/yolov10_3D/model.py).

YOLOv10("yolov10n.yaml").predict/val/train/export — same surface, JAX inside.
Checkpoints: native .ckpt (utils/checkpoint) or reference .pt via the torch
weight converter.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ..cfg import CFG_DIR, Config, get_cfg
from ..nn.build import build_model
from ..utils.checkpoint import load_checkpoint


def _saving_stream(gen, save_kw):
    """Wrap a streaming predict generator so save/save_txt/save_crop apply
    per frame (stems made unique by frame index)."""
    from .predictor import Predictor

    def run():
        for i, r in enumerate(gen):
            r.path = f"{r.path}#{i}"
            Predictor._save_outputs(
                [r],
                save_kw.get("save", False),
                save_kw.get("save_txt", False),
                save_kw.get("save_crop", False),
                save_kw.get("save_dir", "runs/predict"),
            )
            yield r

    return run()


def _resolve_model_cfg(name: str) -> Path:
    p = Path(name)
    if p.exists():
        return p
    stem = p.stem
    families = ["v10-3D"] if "3d" in stem.lower() else [
        "v10", "v8", "rt-detr", "v9", "v5", "v6", "v3",
    ]
    for fam in families:
        cand = CFG_DIR / "models" / fam / f"{stem}.yaml"
        if cand.exists():
            return cand
    raise FileNotFoundError(f"model config not found: {name}")


class Model:
    """Task-routing facade. model may be a YAML (new model) or .ckpt/.pt."""

    task: str = "detect"

    def __init__(self, model: Union[str, Path] = "yolov10n.yaml", task: Optional[str] = None):
        self.overrides: Dict[str, Any] = {}
        self.ckpt_meta: Dict[str, Any] = {}
        self.names: Dict[int, str] = {}
        if task:
            self.task = task
        model = str(model)
        if model.endswith(".ckpt"):
            self._load_native(model)
        elif model.endswith(".pt"):
            self._load_torch(model)
        else:
            self._new(model)

    # -- constructors --
    def _new(self, cfg_name: str, nc: Optional[int] = None):
        path = _resolve_model_cfg(cfg_name)
        self.model_cfg = str(path)
        self.model, self.spec = build_model(str(path), nc=nc)
        if self.spec.head_module == "v10Detect3d":
            self.task = "detect3d"
        hw = 64
        x0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
        self.variables = jax.jit(self.model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x0, train=False
        )
        self.names = {i: f"class{i}" for i in range(self.spec.nc)}

    def _load_native(self, path: str):
        ckpt = load_checkpoint(path)
        meta = ckpt["meta"]
        self.ckpt_meta = meta
        self._new(meta.get("model_yaml", "yolov10n.yaml"), nc=meta.get("nc"))
        params = ckpt.get("ema_params") or ckpt["params"]
        if not params:
            params = ckpt["params"]
        self.variables = {"params": params, "batch_stats": ckpt.get("batch_stats", {})}
        if meta.get("names"):
            self.names = {int(k): v for k, v in meta["names"].items()}
        if meta.get("train_args"):
            self.ckpt_train_args = dict(meta["train_args"])
            self.overrides.update(
                {k: v for k, v in meta["train_args"].items() if k in ("imgsz", "max_det")}
            )

    def _load_torch(self, path: str):
        """Reference .pt checkpoint -> converted variables (prefers EMA like
        attempt_load_one_weight, tasks.py:815). Requires torch."""
        import numpy as np
        import torch

        from ..utils.torch_convert import convert_torch_state_dict

        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except ModuleNotFoundError as e:
            raise RuntimeError(
                f"loading {path} requires the original ultralytics classes on "
                f"sys.path (pickled nn.Module checkpoints): {e}"
            ) from e
        if isinstance(ckpt, dict) and "state_dict" in ckpt and ckpt.get("model_yaml"):
            # our own reverse export (utils/torch_export.py): plain
            # state_dict + model_yaml, no pickled classes — round-trips
            self._new(Path(ckpt["model_yaml"]).stem)
            sd = {
                k: v.detach().float().cpu().numpy()
                for k, v in ckpt["state_dict"].items()
                # dfl arange is decode-closed-form here; o2o_heads.* are
                # v10Detect3d alias keys of the named branches
                if "dfl" not in k and ".o2o_heads." not in k
            }
            self.variables = convert_torch_state_dict(sd, self.variables, strict=True)
            if ckpt.get("names"):
                self.names = {int(k): v for k, v in ckpt["names"].items()}
            if ckpt.get("train_args"):
                self.ckpt_train_args = dict(ckpt["train_args"])
            return
        module = ckpt.get("ema") or ckpt.get("model") or ckpt
        yaml_d = getattr(module, "yaml", None)
        if yaml_d is None:
            raise RuntimeError(f"{path}: no model yaml embedded")
        stem = Path(yaml_d.get("yaml_file", "yolov10n.yaml")).stem
        self._new(stem, nc=yaml_d.get("nc"))
        sd = {
            k: v.detach().float().cpu().numpy()
            for k, v in module.state_dict().items()
            if "dfl" not in k
        }
        self.variables = convert_torch_state_dict(sd, self.variables, strict=True)
        names = getattr(module, "names", None) or ckpt.get("names")
        if names:
            self.names = {int(k): v for k, v in dict(names).items()}

    # -- API --
    def _cfg(self, kwargs) -> Config:
        merged = {**self.overrides, **kwargs}
        return get_cfg(None, merged)

    def predict(self, source, stream: bool = False, **kwargs):
        from ..data.loaders import is_stream_source
        from .predictor import Predictor

        args = self._cfg(kwargs)
        pred = Predictor(self.model, self.spec, self.variables, args, self.names)
        common = dict(
            conf=kwargs.get("conf"),
            max_det=kwargs.get("max_det"),
            imgsz=kwargs.get("imgsz") or self.overrides.get("imgsz") or 640,
            classes=kwargs.get("classes"),
        )
        save_kw = {
            k: kwargs[k]
            for k in ("save", "save_txt", "save_crop", "save_dir")
            if k in kwargs
        }
        endless = isinstance(source, str) and re.fullmatch(r"screen\d*", source)
        if stream or endless or is_stream_source(source):
            gen = pred.stream(
                source, vid_stride=kwargs.get("vid_stride", 1), **common
            )
            if any(save_kw.get(k) for k in ("save", "save_txt", "save_crop")):
                gen = _saving_stream(gen, save_kw)
            if not stream and (endless or is_stream_source(source)):
                from ..utils import LOGGER

                LOGGER.warning(
                    f"source {source!r} is endless (live stream/screen); "
                    "returning a streaming generator — iterate it"
                )
                return gen
            return gen if stream else list(gen)
        return pred(source, batch_size=kwargs.get("batch", 1), **common, **save_kw)

    __call__ = predict

    def val(self, data: Optional[str] = None, **kwargs):
        """Task-dispatched validation (reference task_map ``validator`` slot;
        3D path per models/yolov10_3D/val.py:183 — fitness is KITTI AP40)."""
        from ..cfg import load_dataset_yaml
        from ..data.dataset import DataLoader

        args = self._cfg({**({"data": data} if data else {}), **kwargs})
        d = load_dataset_yaml(args.data)
        batch = kwargs.get("batch", 16)
        if self.task == "detect3d":
            from .trainer3d import build_3d_dataset
            from .validator3d import Detection3DValidator

            ds = build_3d_dataset(args.data, Path(d.get("path", ".")) / d["val"], "val", args)
            loader = DataLoader(ds, batch, shuffle=False, drop_last=False)
            validator = Detection3DValidator(self.model, self.spec, args, d["names"])
            return validator(
                self.variables, ds, loader,
                save_dir=kwargs.get("save_dir", "runs/val3d"),
                conf_threshold=kwargs.get("conf", 0.001),
            )
        imgsz = kwargs.get("imgsz", 640)
        head = self.spec.head_module
        val_root = Path(d.get("path", ".")) / d["val"]
        if head == "RTDETRDecoder":
            from ..data.dataset import YOLODataset
            from .validator_tasks import RTDETRValidator

            ds = YOLODataset(val_root, imgsz=imgsz, augment=False)
            loader = DataLoader(ds, batch, shuffle=False, drop_last=False)
            return RTDETRValidator(self.model, self.spec, args, d["names"])(
                self.variables, loader, conf=kwargs.get("conf", 0.001)
            )
        if head == "Classify":
            from ..data.dataset_tasks import ClassificationDataset
            from .validator_tasks import ClassificationValidator

            ds = ClassificationDataset(
                val_root, imgsz=kwargs.get("imgsz", 224),
                crop_fraction=kwargs.get("crop_fraction", 1.0),
            )
            loader = DataLoader(ds, batch, shuffle=False, drop_last=False)
            return ClassificationValidator(self.model, self.spec, args, ds.names)(
                self.variables, loader
            )
        if head in ("Segment", "Pose", "OBB"):
            from ..data.dataset import YOLODataset
            from ..data.dataset_tasks import PoseEvalDataset, SegmentationEvalDataset
            from .validator_tasks import OBBValidator, PoseValidator, SegmentationValidator

            if head == "Segment":
                ds = SegmentationEvalDataset(val_root, imgsz=imgsz, augment=False)
                validator = SegmentationValidator(self.model, self.spec, args, d["names"])
            elif head == "Pose":
                kpt_shape = tuple(d.get("kpt_shape", (17, 3)))
                ds = PoseEvalDataset(val_root, imgsz=imgsz, augment=False, kpt_shape=kpt_shape)
                validator = PoseValidator(
                    self.model, self.spec, args, d["names"], kpt_shape=kpt_shape
                )
            else:  # OBB: DOTA corner-format labels -> xywhr
                from ..data.dataset_tasks import OBBEvalDataset

                ds = OBBEvalDataset(val_root, imgsz=imgsz, augment=False)
                validator = OBBValidator(self.model, self.spec, args, d["names"])
            loader = DataLoader(ds, batch, shuffle=False, drop_last=False)
            return validator(self.variables, loader, conf=kwargs.get("conf", 0.001))
        from ..data.dataset import YOLODataset
        from .validator import DetectionValidator

        ds = YOLODataset(val_root, imgsz=imgsz, augment=False)
        loader = DataLoader(ds, batch, shuffle=False, drop_last=False)
        validator = DetectionValidator(self.model, self.spec, args, d["names"])
        return validator(self.variables, loader, conf=kwargs.get("conf", 0.001))

    def train(self, teacher=None, **kwargs):
        """teacher: optional frozen feature extractor
        (imgs (B,H,W,3) fp32 [0,1] -> (B,Ht,Wt,C) np embeddings) consumed by
        the 3D trainer's distillation/fgdm_supervision losses."""
        from .trainer import DetectionTrainer
        from .trainer3d import Detection3DTrainer, RTDETRTrainer

        overrides = {**self.overrides, "model": self.model_cfg, **kwargs}
        cfg = get_cfg(None, overrides)
        if self.task == "detect3d":
            cls = Detection3DTrainer
        elif self.spec.head_module == "RTDETRDecoder":
            cls = RTDETRTrainer
        else:
            from .trainer_tasks import TASK_TRAINERS

            cls = TASK_TRAINERS.get(self.spec.head_module, DetectionTrainer)
        trainer = cls(cfg)
        if teacher is not None:
            trainer.teacher = teacher  # frozen distillation teacher callable
        for event, fn in getattr(self, "_callbacks", []):
            trainer.add_callback(event, fn)
        self.trainer = trainer  # surfaced for tune() / callback attachment
        state = trainer.train()
        if state is not None:
            self.variables = {
                "params": jax.device_get(state.ema_params),
                "batch_stats": jax.device_get(state.batch_stats),
            }
            # the trainer rebuilds the model with the DATASET's nc (reference
            # trainer setup_model overriding model.yaml nc); the facade must
            # follow or a later val()/predict() applies the trained params
            # through the stale pre-train head (round-3 fix: ScopeParamShapeError
            # when data nc != yaml nc)
            if getattr(trainer, "model", None) is not None:
                self.model, self.spec = trainer.model, trainer.spec
                from ..cfg import load_dataset_yaml

                try:
                    self.names = dict(load_dataset_yaml(cfg.data)["names"])
                except Exception:
                    pass
        return state

    def tune(self, use_ray: bool = False, iterations: int = 10, **kwargs):
        """Hyperparameter search (reference engine/model.py ``tune``):
        mutation evolution by default; ``use_ray=True`` dispatches to the
        Ray Tune ASHA search (``engine/tuner.run_ray_tune``, gated on ray)."""
        if use_ray:
            from .tuner import run_ray_tune

            return run_ray_tune(self, max_samples=iterations, **kwargs)
        from .tuner import Tuner

        save_dir = kwargs.pop("save_dir", "runs/tune")

        def train_fn(hyp):
            self.train(**{**kwargs, **hyp})
            return float(getattr(self.trainer, "best_fitness", 0.0) or 0.0)

        return Tuner(train_fn, save_dir=save_dir)(iterations=iterations)

    def track(self, source, tracker: str = "bytetrack", persist: bool = False, **kwargs):
        """Frame-stream tracking (reference engine/model.py ``track`` +
        trackers/track.py callbacks). Returns Results with a track-id column
        appended to each box row."""
        import numpy as np

        from ..trackers import BOTSORT, BYTETracker

        if not persist or not hasattr(self, "_tracker"):
            self._tracker = BOTSORT() if "botsort" in str(tracker) else BYTETracker()
        results = self.predict(source, **kwargs)
        # BoT-SORT gets the frame for camera-motion compensation (the GMC was
        # dead code without it — review finding); ByteTrack takes no frame
        frame_kw = {} if not hasattr(self._tracker, "gmc") else None
        for r in results:
            b = r.boxes
            kw = {"img": r.orig_img} if frame_kw is None else {}
            if b is None or len(b) == 0:
                tracks = self._tracker.update(
                    np.zeros((0, 4)), np.zeros(0), np.zeros(0), **kw
                )
            else:
                tracks = self._tracker.update(b.xyxy, b.conf, b.cls, **kw)
            # re-order result rows to the tracker output: x1y1x2y2, conf, cls, id
            if len(tracks):
                data = np.concatenate(
                    [tracks[:, :4], tracks[:, 5:6], tracks[:, 6:7], tracks[:, 4:5]], -1
                )
            else:
                data = np.zeros((0, 7))
            from .results import Boxes

            r.boxes = Boxes(data, r.orig_shape)
        return results

    def export(self, **kwargs):
        from .exporter import Exporter

        fmt = kwargs.pop("format", "stablehlo")
        imgsz = kwargs.pop("imgsz", 640)
        out = kwargs.pop("out", None)
        batch = kwargs.pop("batch", 1)
        int8 = kwargs.pop("int8", False)
        half = kwargs.pop("half", False)
        data = kwargs.pop("data", None)
        return Exporter(
            self.model, self.spec, self.variables, self._cfg(kwargs),
            meta={"model_yaml": str(getattr(self, "model_cfg", "")),
                  "names": {int(k): v for k, v in self.names.items()},
                  "train_args": getattr(self, "ckpt_train_args", None)},
        )(fmt=fmt, imgsz=imgsz, out=out, batch=batch, int8=int8, half=half,
          data=data)

    def add_callback(self, event: str, fn):
        """Register a trainer callback (reference engine/model.py:831
        ``Model.add_callback``). Stored on the facade and attached to every
        trainer this model constructs."""
        if not hasattr(self, "_callbacks"):
            self._callbacks = []
        self._callbacks.append((event, fn))
        if getattr(self, "trainer", None) is not None:
            self.trainer.add_callback(event, fn)

    def clear_callback(self, event: str):
        """Drop every handler for ``event`` (reference clear_callback)."""
        self._callbacks = [
            (e, f) for e, f in getattr(self, "_callbacks", []) if e != event
        ]
        if getattr(self, "trainer", None) is not None:
            self.trainer.callbacks.pop(event, None)

    def reset_callbacks(self):
        """Drop all facade-registered handlers (reference reset_callbacks)."""
        self._callbacks = []

    def info(self):
        n_params = sum(v.size for v in jax.tree.leaves(self.variables["params"]))
        return {
            "task": self.task,
            "nc": self.spec.nc,
            "strides": self.spec.strides,
            "parameters": int(n_params),
        }


class YOLOv10(Model):
    task = "detect"


class YOLOv10_3D(Model):
    task = "detect3d"


class YOLO(Model):
    """Stem-dispatching facade (reference cfg/__init__.py:568-585)."""

    def __init__(self, model="yolov10n.yaml", task=None):
        stem = Path(str(model)).stem.lower()
        if "3d" in stem:
            self.task = "detect3d"
        super().__init__(model, task=task)
