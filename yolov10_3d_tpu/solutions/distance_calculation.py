"""Pairwise distance between selected tracks (reference:
solutions/distance_calculation.py)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class DistanceCalculator:
    def __init__(self, pixels_per_meter: float = 10.0):
        self.ppm = pixels_per_meter

    def update(self, tracks: np.ndarray) -> Dict[Tuple[int, int], float]:
        """Returns {(id_a, id_b): meters} for all track pairs."""
        tracks = np.asarray(tracks).reshape(-1, 7)
        out = {}
        centers = {(int(t[4])): ((t[0] + t[2]) / 2, (t[1] + t[3]) / 2) for t in tracks}
        ids = sorted(centers)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = np.hypot(
                    centers[a][0] - centers[b][0], centers[a][1] - centers[b][1]
                )
                out[(a, b)] = float(d / self.ppm)
        return out
