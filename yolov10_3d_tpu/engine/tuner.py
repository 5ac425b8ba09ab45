"""Mutation-based hyperparameter evolution (reference: engine/tuner.py
``Tuner``): mutate from the best past run, train briefly, keep the fittest.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

# (min, max, gain) per mutable key — the reference's default space
DEFAULT_SPACE: Dict[str, Tuple[float, float]] = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "box": (0.02, 10.0),
    "cls": (0.2, 4.0),
    "dfl": (0.4, 6.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
}


class Tuner:
    def __init__(
        self,
        train_fn: Callable[[Dict], float],
        space: Optional[Dict[str, Tuple[float, float]]] = None,
        save_dir: str = "runs/tune",
        seed: int = 0,
    ):
        """train_fn(hyp_overrides) -> fitness; the facade wires this to a
        short model.train + val."""
        self.train_fn = train_fn
        self.space = dict(space or DEFAULT_SPACE)
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.rng = random.Random(seed)
        self.results: list = []

    def _mutate(self, parent: Dict[str, float], sigma: float = 0.2) -> Dict[str, float]:
        child = {}
        for k, (lo, hi) in self.space.items():
            v = parent.get(k, (lo + hi) / 2)
            if self.rng.random() < 0.8:  # mutation probability
                v = v * (1 + self.rng.gauss(0, sigma))
            child[k] = min(max(v, lo), hi)
        return child

    def __call__(self, iterations: int = 10, initial: Optional[Dict[str, float]] = None):
        best_hyp = dict(initial or {})
        best_fitness = -1.0
        csv_path = self.save_dir / "tune_results.csv"
        for it in range(iterations):
            hyp = self._mutate(best_hyp) if it > 0 else {
                k: best_hyp.get(k, (lo + hi) / 2) for k, (lo, hi) in self.space.items()
            }
            fitness = float(self.train_fn(hyp))
            self.results.append((fitness, hyp))
            if fitness > best_fitness:
                best_fitness, best_hyp = fitness, hyp
            with open(csv_path, "a", newline="") as f:
                w = csv.writer(f)
                if it == 0:
                    w.writerow(["iter", "fitness"] + list(self.space))
                w.writerow([it, fitness] + [hyp[k] for k in self.space])
        return best_hyp, best_fitness


def run_ray_tune(
    model,
    space: Optional[Dict] = None,
    grace_period: int = 10,
    max_samples: int = 10,
    tpu_per_trial: int = 0,
    **train_args,
):
    """Ray Tune ASHA search over the training hyperparameters (reference:
    utils/tuner.py:9 ``run_ray_tune``). Gated on ray importability — the
    package is not in this image, so this raises a clear RuntimeError
    locally and works wherever ``ray[tune]`` is installed.

    The per-trial metric stream arrives through the trainer's
    ``_RayTuneReporter`` integration callback (utils/callbacks.py), the
    direct analogue of the reference's raytune callback."""
    try:
        from ray import train as ray_train  # noqa: F401
        from ray import tune
        from ray.tune.schedulers import ASHAScheduler
    except ImportError as e:
        raise RuntimeError(f"run_ray_tune requires ray[tune]: {e}")

    if not space:
        space = {k: tune.uniform(lo, hi) for k, (lo, hi) in DEFAULT_SPACE.items()}

    def _tune(config):
        cfg = dict(config)
        cfg.update(train_args)
        model.train(**cfg)

    trainable = tune.with_resources(
        _tune, {"cpu": 4, **({"TPU": tpu_per_trial} if tpu_per_trial else {})}
    )
    scheduler = ASHAScheduler(
        time_attr="epoch",
        metric=train_args.get("metric", "fitness"),
        mode="max",
        max_t=int(train_args.get("epochs", 100)),
        grace_period=grace_period,
        reduction_factor=3,
    )
    tuner = tune.Tuner(
        trainable,
        param_space=space,
        tune_config=tune.TuneConfig(scheduler=scheduler, num_samples=max_samples),
    )
    results = tuner.fit()
    return results
