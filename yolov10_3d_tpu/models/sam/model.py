"""SAM facade (reference: models/sam/model.py ``SAM``).

Builds a variant by name, optionally converts a torch .pt checkpoint, and
exposes predict()/__call__ with prompt passthrough plus model info.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .build import Sam, build_sam
from .predict import SAMPredictor


class SAM:
    """Promptable segmentation model facade."""

    def __init__(self, model: str = "sam_b.pt", img_size: int = 1024):
        self.model_name = str(model)
        self.model = build_sam(self.model_name, img_size=img_size)
        self.variables = self._init_variables()
        if Path(self.model_name).exists():
            self._load_weights(self.model_name)
        self.predictor: Optional[SAMPredictor] = None

    def _init_variables(self):
        s = self.model.img_size
        x = jnp.zeros((1, s, s, 3), jnp.float32)
        return jax.jit(
            lambda: self.model.init(jax.random.PRNGKey(0), x, method=Sam.init_all)
        )()

    def _load_weights(self, path: str):
        """Convert a torch SAM state_dict (.pt) or load a native .ckpt."""
        if path.endswith(".ckpt"):
            from ...utils.checkpoint import load_checkpoint

            ckpt = load_checkpoint(path)  # params/batch_stats layout — there
            params = ckpt.get("ema_params") or ckpt["params"]  # is no
            self.variables = {"params": params}  # "variables" key (review)
            if ckpt.get("batch_stats"):
                self.variables["batch_stats"] = ckpt["batch_stats"]
            return
        import torch

        from ...utils.torch_convert import convert_torch_state_dict

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        # pixel_mean/std buffers are constants in this implementation
        sd = {k: v for k, v in sd.items() if not k.startswith("pixel_")}
        self.variables = convert_torch_state_dict(sd, self.variables)

    def predict(self, source, bboxes=None, points=None, labels=None, **kwargs):
        """Run promptable segmentation on an image (HWC uint8 RGB ndarray or
        path). Returns (masks, scores) or AMG (masks, scores, boxes)."""
        if self.predictor is None:
            self.predictor = SAMPredictor(self.model, self.variables)
        img = source
        if isinstance(source, (str, Path)):
            from PIL import Image

            img = np.asarray(Image.open(source).convert("RGB"))
        return self.predictor(img, bboxes=bboxes, points=points, labels=labels, **kwargs)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def info(self):
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.variables)
        )
        return {"model": self.model_name, "params": n_params}
