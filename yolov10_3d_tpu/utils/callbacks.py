"""Callback registry + logger integrations (reference:
utils/callbacks/base.py — 26 event hooks; tensorboard.py, wb.py etc.).

The trainer fires events by name; integrations attach via
``add_integration_callbacks(trainer)`` keyed off availability (the reference
keys off SETTINGS toggles + importability — same idea, no network services).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List

# the reference's event list (callbacks/base.py:11-185)
EVENTS = [
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    "on_predict_start", "on_predict_batch_start", "on_predict_batch_end",
    "on_predict_postprocess_end", "on_predict_end",
    "on_export_start", "on_export_end",
]


def default_callbacks() -> Dict[str, List[Callable]]:
    return {e: [] for e in EVENTS}


class TensorBoardLogger:
    """Scalar logging via tensorboardX/torch SummaryWriter if available, else
    a TSV fallback (always works offline)."""

    def __init__(self, log_dir: str):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(str(self.log_dir))
        except Exception:
            self._tsv = open(self.log_dir / "scalars.tsv", "a")

    def scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        else:
            self._tsv.write(f"{step}\t{tag}\t{value}\n")
            self._tsv.flush()

    def close(self):
        if self.writer is not None:
            self.writer.close()
        else:
            self._tsv.close()


def add_integration_callbacks(trainer):
    """Attach available integrations (reference callbacks/base.py:188)."""
    tb = TensorBoardLogger(str(Path(trainer.save_dir) / "tb"))

    def on_epoch_end(tr):
        state = tr.state
        if state is None:
            return
        step = int(state.step)
        # best-effort: log whatever the trainer accumulated this epoch
        for k, v in getattr(tr, "last_metrics", {}).items():
            try:
                tb.scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def on_end(tr):
        tb.close()
        from .plotting import plot_results

        csv_path = Path(tr.save_dir) / "results.csv"
        if csv_path.exists():
            plot_results(csv_path)

    trainer.add_callback("on_train_epoch_end", on_epoch_end)
    trainer.add_callback("on_train_end", on_end)
    return trainer
