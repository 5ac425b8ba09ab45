"""Flat config system (reference: ultralytics/cfg/__init__.py + utils
IterableSimpleNamespace / DEFAULT_CFG_DICT).

``get_cfg(cfg, overrides)`` merges default.yaml < cfg < overrides with light
type checking and fuzzy-mismatch suggestions, returning a SimpleNamespace-like
object. Checkpoints embed their config the same way the reference embeds
``train_args``.
"""

from __future__ import annotations

import difflib
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional, Union

import yaml

CFG_DIR = Path(__file__).resolve().parent
DEFAULT_CFG_PATH = CFG_DIR / "default.yaml"

# typed key groups (reference cfg/__init__.py:100-177)
CFG_FLOAT_KEYS = {
    "warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time",
    "loss2d", "depth", "offset3d", "size3d", "heading",
    "tal_alpha", "tal_beta", "tal_gamma",
}
CFG_FRACTION_KEYS = {
    "dropout", "iou", "lr0", "lrf", "momentum", "weight_decay",
    "warmup_momentum", "warmup_bias_lr", "label_smoothing", "hsv_h", "hsv_s",
    "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr", "bgr",
    "mosaic", "mixup", "copy_paste", "conf", "fraction", "random_crop",
}
CFG_INT_KEYS = {
    "epochs", "patience", "workers", "seed", "close_mosaic",
    "mask_ratio", "max_det", "vid_stride", "line_width", "workspace", "nbs",
    "save_period", "val_period", "ckpt_period_steps", "tal_topk", "close_mixup",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect",
    "cos_lr", "overlap_mask", "val", "save_json", "save_hybrid", "half",
    "dnn", "plots", "show", "save_txt", "save_conf", "save_crop",
    "save_frames", "show_labels", "show_conf", "visualize", "augment",
    "agnostic_nms", "retina_masks", "show_boxes", "keras", "optimize",
    "int8", "dynamic", "simplify", "nms", "profile", "multi_scale", "spd_serving",
    "tal_2d", "tal_3d", "constrain_anchors", "htl", "overfit",
    "distillation", "load_depth_maps", "fgdm_loss", "fgdm_supervision",
    "use_o2m_depth", "use_dino_depth", "plot_labels", "pretrained_backbone",
    "cam_dis", "amp", "stream_buffer", "device_preprocess", "device_aug",
}


class Config(SimpleNamespace):
    """Dot-access config that also behaves like a mapping."""

    def get(self, key: str, default=None):
        return getattr(self, key, default)

    def __getitem__(self, key):
        return getattr(self, key)

    def __contains__(self, key):
        return hasattr(self, key)

    def to_dict(self) -> Dict[str, Any]:
        return dict(vars(self))

    def __iter__(self):
        return iter(vars(self).items())


def default_cfg_dict() -> Dict[str, Any]:
    with open(DEFAULT_CFG_PATH) as f:
        return yaml.safe_load(f)


def _coerce(key: str, v: Any) -> Any:
    if v is None:
        return v
    try:
        if key in CFG_INT_KEYS and not isinstance(v, bool):
            return int(v)
        if key in CFG_FLOAT_KEYS or key in CFG_FRACTION_KEYS:
            return float(v)
        if key in CFG_BOOL_KEYS and isinstance(v, str):
            return v.lower() in ("true", "1", "yes")
    except (TypeError, ValueError) as e:
        raise ValueError(f"config key '{key}'={v!r}: {e}") from e
    return v


def check_dict_alignment(base: Dict[str, Any], custom: Dict[str, Any]):
    """Unknown-key detection with fuzzy suggestions (reference
    cfg/__init__.py ``check_dict_alignment``)."""
    unknown = [k for k in custom if k not in base]
    if unknown:
        msgs = []
        for k in unknown:
            close = difflib.get_close_matches(k, base.keys(), n=3)
            hint = f" (did you mean {close}?)" if close else ""
            msgs.append(f"'{k}' is not a valid config key{hint}")
        raise KeyError("; ".join(msgs))


def get_cfg(
    cfg: Union[str, Path, Dict[str, Any], Config, None] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> Config:
    """Merge default < cfg < overrides (reference cfg/__init__.py:197
    ``get_cfg``). Precedence mirrors the reference: explicit kwargs win."""
    base = default_cfg_dict()
    if cfg is not None:
        if isinstance(cfg, (str, Path)):
            with open(cfg) as f:
                cfg = yaml.safe_load(f)
        elif isinstance(cfg, Config):
            cfg = cfg.to_dict()
        check_dict_alignment(base, cfg)
        base.update(cfg)
    if overrides:
        overrides = {k: v for k, v in overrides.items() if v is not None or k in base}
        check_dict_alignment(base, overrides)
        base.update(overrides)
    base = {k: _coerce(k, v) for k, v in base.items()}
    return Config(**base)


def load_dataset_yaml(path: Union[str, Path]) -> Dict[str, Any]:
    """Dataset YAML: {path, train, val, names|nc, ...} (reference
    data/utils.py ``check_det_dataset`` without the download machinery)."""
    path = Path(path)
    if not path.exists():
        candidate = CFG_DIR / "datasets" / path.name
        if candidate.exists():
            path = candidate
        else:
            raise FileNotFoundError(f"dataset yaml not found: {path}")
    with open(path) as f:
        d = yaml.safe_load(f)
    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    if names is None and "nc" in d:
        names = {i: f"class{i}" for i in range(int(d["nc"]))}
    d["names"] = names
    d["nc"] = len(names)
    return d
