"""Hierarchical Task Learning loss weighting (reference: utils/htl.py
``Hierarchical_Task_Learning`` — MonoDLE-style epoch-wise term weighting
from a dependency graph, driven per-epoch by the trainer at
trainer.py:349-358,399-400).

Terms with no predecessors keep weight 1; dependent terms ramp in as
``time^(1-control)`` where control is the product of their predecessors'
normalized improvement over a trailing 5-epoch window. Weights are
normalized to sum to len(graph)/2 (the reference's ``* 6.0`` for 12 terms).

The weight vector is injected into the jitted 3D train step as a plain
``(12,)`` array in the batch (``htl_weights``) — values change per epoch,
shapes don't, so there is no recompilation.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

# canonical per-term order of the 3D loss items — imported, not duplicated:
# LOSS_GRAPH indices, the trainer's loss vector, and detect3d_loss's weight
# pairing all key off this single tuple
from .loss3d import ITEM_KEYS  # noqa: E402

# term index -> predecessor term indices (reference htl.py:9-21: dep <- bbox,
# s3d; o3d/s3d/hd <- bbox, per branch)
LOSS_GRAPH: Dict[int, List[int]] = {
    0: [],        # box2d_om
    1: [],        # cls_om
    2: [0, 4],    # dep_om   <- box2d_om, s3d_om
    3: [0],       # o3d_om   <- box2d_om
    4: [0],       # s3d_om   <- box2d_om
    5: [0],       # hd_om    <- box2d_om
    6: [],        # box2d_oo
    7: [],        # cls_oo
    8: [6, 10],   # dep_oo   <- box2d_oo, s3d_oo
    9: [6],       # o3d_oo
    10: [6],      # s3d_oo
    11: [6],      # hd_oo
}


class HierarchicalTaskLearning:
    """compute_weight(current_loss, epoch) -> (12,) weights (htl.py:24-57)."""

    def __init__(self, stat_epoch_nums: int = 5, max_epochs: int = 200):
        self.stat_epoch_nums = stat_epoch_nums
        self.max_epochs = max_epochs
        self.past_losses: List[np.ndarray] = []
        self.init_diff: np.ndarray | None = None

    # -- checkpoint persistence (resume must not restart the ramp) --
    def state_dict(self) -> Dict:
        return {
            "past_losses": [list(map(float, v)) for v in self.past_losses],
            "init_diff": (
                list(map(float, self.init_diff)) if self.init_diff is not None else None
            ),
        }

    def load_state_dict(self, d: Dict):
        self.past_losses = [np.asarray(v, np.float64) for v in d.get("past_losses", [])]
        di = d.get("init_diff")
        self.init_diff = np.asarray(di, np.float64) if di is not None else None

    def compute_weight(self, current_loss: Sequence[float], epoch: int) -> np.ndarray:
        current = np.asarray(current_loss, np.float64)
        n = len(LOSS_GRAPH)
        weights = np.array(
            [1.0 if not LOSS_GRAPH[i] else 0.0 for i in range(n)], np.float64
        )
        if len(self.past_losses) == self.stat_epoch_nums:
            past = np.stack(self.past_losses)  # (S, 12)
            mean_diff = (past[:-2] - past[2:]).mean(0)
            if self.init_diff is None:
                self.init_diff = mean_diff.copy()
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.where(self.init_diff != 0, mean_diff / self.init_diff, 0.0)
            c_weights = 1.0 - np.maximum(ratio, 0.0)
            time_value = min((epoch - self.stat_epoch_nums) / max(self.max_epochs - self.stat_epoch_nums, 1), 1.0)
            time_value = max(time_value, 0.0)
            for i, preds in LOSS_GRAPH.items():
                if preds:
                    control = 1.0
                    for p in preds:
                        control *= c_weights[p]
                    weights[i] = time_value ** (1.0 - control)
            if not np.all(np.isfinite(weights)):
                # inf must also go to 0: the default posinf conversion
                # (~1.8e308) would make one overflowed term absorb the whole
                # normalized weight budget
                weights = np.nan_to_num(weights, nan=0.0, posinf=0.0, neginf=0.0)
            self.past_losses.pop(0)
        self.past_losses.append(current)
        s = weights.sum()
        if s <= 0:
            return np.ones(n, np.float32) * (n / 2) / n
        return (weights / s * (n / 2)).astype(np.float32)
