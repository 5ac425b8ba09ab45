"""YOLO-World facade (reference: nn/tasks.py:573 WorldModel + models/yolo
world task). The CLIP text encoder is an external dependency (offline
unavailable), so `set_classes` takes a pluggable ``encode_fn(list[str]) ->
(K, 512) ndarray``; without one, stored text features can be set directly
via `set_text_features` (e.g. precomputed CLIP embeddings from disk)."""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class YOLOWorld:
    def __init__(self, cfg: str = "yolov8-worldv2", scale: str = "s", nc: int = 80):
        from ..nn.build import build_model

        from pathlib import Path

        from ..cfg import CFG_DIR

        # package-relative resolution (a CWD-relative literal broke any
        # working directory but the repo root — review finding)
        path = (
            cfg if cfg.endswith(".yaml") and Path(cfg).exists()
            else str(CFG_DIR / "models" / "v8" / f"{Path(cfg).stem}.yaml")
        )
        self.model, self.spec = build_model(path, scale=scale, nc=nc)
        self.names: List[str] = [str(i) for i in range(nc)]
        self.txt_feats = jnp.zeros((1, nc, 512), jnp.float32)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        self.variables = jax.jit(
            lambda: self.model.init(
                jax.random.PRNGKey(0), x0, train=False, txt_feats=self.txt_feats
            )
        )()
        # ONE jitted forward reused across predict() calls (a fresh
        # jax.jit(lambda) per call missed the compile cache every frame)
        self._fwd = jax.jit(
            lambda v, x, t: self.model.apply(v, x, train=False, txt_feats=t)
        )

    def set_text_features(self, feats: np.ndarray, names: Optional[Sequence[str]] = None):
        """Directly install (K, 512) L2-normalized text features."""
        f = np.asarray(feats, np.float32)
        f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        self.txt_feats = jnp.asarray(f[None])
        if names is not None:
            self.names = list(names)

    def set_classes(self, text: Sequence[str], encode_fn: Callable):
        """Set the detected vocabulary (reference tasks.py:582 set_classes);
        encode_fn embeds the class names (CLIP-compatible, (K, 512))."""
        self.set_text_features(encode_fn(list(text)), names=text)

    def predict(self, image: np.ndarray, conf: float = 0.25, max_det: int = 300):
        """HWC uint8/float image -> dict(boxes, scores, labels) in input px."""
        from ..ops.postprocess import v8_detections

        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        x = jnp.asarray(img[None])
        K = self.txt_feats.shape[1]
        maps = self._fwd(self.variables, x, self.txt_feats)
        det = v8_detections(maps, self.spec.strides, K, max_det=max_det, conf=conf)
        return {k: np.asarray(v)[0] for k, v in det.items()}
