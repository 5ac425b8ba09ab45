"""Region/line object counting over tracked detections (reference:
solutions/object_counter.py)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _side(p, a, b) -> float:
    return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])


def _point_in_polygon(p, poly) -> bool:
    x, y = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1
            if x < xin:
                inside = not inside
    return inside


class ObjectCounter:
    """Counts tracks crossing a line (2 points) or entering a region (>=3)."""

    def __init__(self, region: Sequence[Tuple[float, float]]):
        self.region = [tuple(p) for p in region]
        self.is_line = len(self.region) == 2
        self.in_count = 0
        self.out_count = 0
        self.counted: set = set()
        self._last_side: Dict[int, float] = {}
        self._inside: Dict[int, bool] = {}

    def update(self, tracks: np.ndarray):
        """tracks: (N, 7) = x1, y1, x2, y2, id, conf, cls (BYTETracker output)."""
        for t in np.asarray(tracks).reshape(-1, 7):
            tid = int(t[4])
            cx, cy = (t[0] + t[2]) / 2, (t[1] + t[3]) / 2
            if self.is_line:
                s = _side((cx, cy), self.region[0], self.region[1])
                prev = self._last_side.get(tid)
                if prev is not None and np.sign(prev) != np.sign(s) and s != 0:
                    if s > 0:
                        self.in_count += 1
                    else:
                        self.out_count += 1
                self._last_side[tid] = s
            else:
                now = _point_in_polygon((cx, cy), self.region)
                prev = self._inside.get(tid, False)
                if now and not prev:
                    self.in_count += 1
                elif prev and not now:
                    self.out_count += 1
                self._inside[tid] = now
        return {"in": self.in_count, "out": self.out_count}
