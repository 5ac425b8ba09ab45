"""Unified inference backend dispatch (reference: nn/autobackend.py
``AutoBackend`` — suffix-keyed loading of 13 formats).

TPU-native formats: native .ckpt (flax weights, rebuilt model), reference .pt
(via the torch weight converter), and a serialized StableHLO export directory
(AOT artifact, weights baked in). All expose ``forward(imgs NHWC fp32) ->
(boxes_or_reg, scores, labels)`` with fixed shapes + ``warmup()``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AutoBackend:
    def __init__(self, weights: str, max_det: Optional[int] = None):
        self.path = str(weights)
        p = Path(self.path)
        self.kind = (
            "stablehlo"
            if p.is_dir() and (p / "model.serialized").exists()
            else p.suffix.lstrip(".")
        )
        if self.kind == "stablehlo":
            import json

            from ..engine.exporter import load_exported

            self._call = load_exported(self.path)
            meta = json.loads((p / "metadata.json").read_text())
            self.nc = meta["nc"]
            self.max_det = meta["max_det"]
            self.input_shape = tuple(meta["input_shape"])
            self.names = {i: str(i) for i in range(self.nc)}
        elif self.kind in ("ckpt", "pt"):
            from ..engine.model import Model

            facade = Model(self.path)
            self.facade = facade
            self.nc = facade.spec.nc
            self.names = facade.names
            self.max_det = max_det or (
                50 if facade.spec.head_module == "v10Detect3d" else 300
            )
            spec = facade.spec
            task3d = spec.head_module == "v10Detect3d"
            md = self.max_det

            if task3d:
                from ..ops.postprocess import decode_detect3d, v10_3d_postprocess

                @jax.jit
                def call(x):
                    feats = facade.model.apply(facade.variables, x, train=False)["one2one"]
                    preds = decode_detect3d(feats, spec.strides[: len(feats)], spec.nc)
                    return v10_3d_postprocess(preds, md, spec.nc)
            else:
                from ..ops.postprocess import v10_detections

                @jax.jit
                def call(x):
                    feats = facade.model.apply(facade.variables, x, train=False)["one2one"]
                    det = v10_detections(feats, spec.strides, spec.nc, max_det=md)
                    return det["boxes"], det["scores"], det["labels"]

            self._call = call
            self.input_shape = None
        else:
            raise ValueError(
                f"unsupported weights format {self.kind!r} "
                "(supported: .ckpt, .pt, stablehlo export dir)"
            )

    def forward(self, imgs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        out = self._call(jnp.asarray(imgs))
        return tuple(np.asarray(o) for o in out)

    __call__ = forward

    def warmup(self, imgsz: Tuple[int, int, int, int] = (1, 640, 640, 3)):
        shape = self.input_shape or imgsz
        self.forward(np.zeros(shape, np.float32))
        return self
