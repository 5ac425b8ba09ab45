"""Detection-density heatmap over a video stream (reference: solutions/heatmap.py)."""

from __future__ import annotations

import numpy as np


class Heatmap:
    def __init__(self, shape, decay: float = 0.99):
        self.acc = np.zeros(shape[:2], np.float32)
        self.decay = decay

    def update(self, tracks: np.ndarray):
        """tracks: (N, >=4) xyxy... accumulates box footprints."""
        self.acc *= self.decay
        h, w = self.acc.shape
        for t in np.asarray(tracks).reshape(-1, tracks.shape[-1] if len(tracks) else 7):
            x1, y1, x2, y2 = (int(np.clip(v, 0, lim - 1)) for v, lim in zip(t[:4], (w, h, w, h)))
            self.acc[y1:y2, x1:x2] += 1.0
        return self.acc

    def render(self, img: np.ndarray, alpha: float = 0.5) -> np.ndarray:
        import cv2

        norm = self.acc / max(self.acc.max(), 1e-6)
        cmap = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)[..., ::-1]
        return (img * (1 - alpha) + cmap * alpha).astype(np.uint8)
