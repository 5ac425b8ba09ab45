"""Track speed estimation (reference: solutions/speed_estimation.py):
pixel displacement across frames -> speed via a pixels-per-meter scale."""

from __future__ import annotations

from typing import Dict

import numpy as np


class SpeedEstimator:
    def __init__(self, fps: float = 30.0, pixels_per_meter: float = 10.0, window: int = 5):
        self.fps = fps
        self.ppm = pixels_per_meter
        self.window = window
        self.history: Dict[int, list] = {}

    def update(self, tracks: np.ndarray) -> Dict[int, float]:
        """Returns {track_id: speed_kmh}."""
        speeds = {}
        for t in np.asarray(tracks).reshape(-1, 7):
            tid = int(t[4])
            c = ((t[0] + t[2]) / 2, (t[1] + t[3]) / 2)
            h = self.history.setdefault(tid, [])
            h.append(c)
            if len(h) > self.window:
                h.pop(0)
            if len(h) >= 2:
                d_px = np.hypot(h[-1][0] - h[0][0], h[-1][1] - h[0][1])
                dt = (len(h) - 1) / self.fps
                speeds[tid] = d_px / self.ppm / dt * 3.6
        return speeds
