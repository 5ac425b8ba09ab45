"""Hierarchical Task Learning loss weighting (reference: utils/htl.py —
MonoDLE-style epoch-wise term weighting from a dependency graph).

Terms ramp in as their predecessor terms stabilise: weight =
(current_epoch / total)^ (1 - control), where control is the mean
normalized improvement of the predecessor losses over a trailing window.
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Dict, List, Sequence

# term -> predecessor terms (reference htl.py:3-20: dep <- bbox, s3d;
# o3d/s3d/hd <- bbox)
DEFAULT_GRAPH = {
    "box2d": [],
    "cls": [],
    "s3d": ["box2d"],
    "o3d": ["box2d"],
    "hd": ["box2d"],
    "dep": ["box2d", "s3d"],
}


class HTLWeighter:
    def __init__(self, epochs: int, graph: Dict[str, List[str]] = None, window: int = 5):
        self.epochs = epochs
        self.graph = dict(graph or DEFAULT_GRAPH)
        self.window = window
        self.history: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window + 1))

    def record(self, losses: Dict[str, float]):
        """Call once per epoch with mean per-term losses."""
        for k, v in losses.items():
            base = k.replace("_om", "").replace("_oo", "")
            self.history[base].append(float(v))

    def _stability(self, term: str) -> float:
        h = self.history.get(term)
        if not h or len(h) < 2:
            return 0.0
        start, end = h[0], h[-1]
        if start <= 0:
            return 1.0
        return max(0.0, min(1.0, (start - end) / start))

    def weights(self, epoch: int) -> Dict[str, float]:
        """Per-term multipliers for this epoch (reference htl.py:23-56)."""
        time_frac = min(max(epoch / max(self.epochs, 1), 0.0), 1.0)
        out = {}
        for term, preds in self.graph.items():
            if not preds:
                out[term] = 1.0
                continue
            control = (
                sum(self._stability(p) for p in preds) / len(preds) if preds else 1.0
            )
            out[term] = time_frac ** (1.0 - control)
        return out
