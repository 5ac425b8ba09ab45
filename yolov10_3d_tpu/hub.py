"""Model hub (reference: ultralytics/hub — auth/session/upload to the
Ultralytics SaaS).

This environment has no network egress, so the SaaS client is replaced by a
LOCAL hub: the same session surface (create/list/upload/download models and
run metrics) backed by a directory registry. `login()` exists for API parity
and explains the gate.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Dict, List, Optional

DEFAULT_HUB_DIR = Path.home() / ".yolov10_3d_tpu" / "hub"


def login(api_key: Optional[str] = None, save: bool = True) -> bool:
    """SaaS authentication is unavailable offline (reference hub login);
    use LocalHub for a filesystem-backed registry."""
    raise RuntimeError(
        "remote hub authentication requires network access (unavailable in "
        "this environment); use yolov10_3d_tpu.hub.LocalHub for a local "
        "model registry"
    )


def logout() -> None:
    """No-op for API parity (reference hub logout)."""


class LocalHub:
    """Filesystem model registry with the HUBTrainingSession surface
    (reference hub/session.py:17): upload_model, upload_metrics, list/pull."""

    def __init__(self, root: Optional[str] = None):
        self.root = Path(root or DEFAULT_HUB_DIR)
        self.root.mkdir(parents=True, exist_ok=True)

    def _model_dir(self, model_id: str) -> Path:
        d = self.root / model_id
        d.mkdir(parents=True, exist_ok=True)
        return d

    def upload_model(
        self, model_id: str, weights: str, epoch: Optional[int] = None,
        is_best: bool = False, final: bool = False,
    ) -> str:
        """Store a checkpoint under the model id (reference session
        upload_model)."""
        d = self._model_dir(model_id)
        name = (
            "best.ckpt" if is_best
            else "final.ckpt" if final
            else f"epoch{epoch}.ckpt" if epoch is not None
            else "latest.ckpt"  # default upload (was 'epochNone.ckpt')
        )
        dst = d / name
        shutil.copy2(weights, dst)
        meta = {"uploaded": time.time(), "epoch": epoch, "best": is_best, "final": final}
        (d / (name + ".json")).write_text(json.dumps(meta))
        return str(dst)

    def upload_metrics(self, model_id: str, metrics: Dict, epoch: int) -> None:
        d = self._model_dir(model_id)
        with open(d / "metrics.jsonl", "a") as f:
            f.write(json.dumps({"epoch": epoch, **metrics}) + "\n")

    def get_metrics(self, model_id: str) -> List[Dict]:
        p = self.root / model_id / "metrics.jsonl"
        if not p.exists():
            return []
        return [json.loads(l) for l in p.read_text().splitlines()]

    def list_models(self) -> List[str]:
        return sorted(p.name for p in self.root.iterdir() if p.is_dir())

    def pull(self, model_id: str, name: str = "best.ckpt") -> str:
        p = self.root / model_id / name
        if not p.exists():
            raise FileNotFoundError(f"{model_id}/{name} not in the local hub")
        return str(p)
