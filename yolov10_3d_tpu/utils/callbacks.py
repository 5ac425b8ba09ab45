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


class _MLflowLogger:
    """reference callbacks/mlflow.py: params at start, metrics per epoch."""

    def __init__(self, trainer):
        import mlflow

        self.mlflow = mlflow
        mlflow.set_experiment(getattr(trainer.args, "project", None) or "yolov10_3d_tpu")
        mlflow.start_run(run_name=getattr(trainer.args, "name", None) or "train")
        mlflow.log_params(
            {k: str(v) for k, v in trainer.args.to_dict().items()}
        )

    def metrics(self, metrics, step):
        self.mlflow.log_metrics(
            {k.replace("(", "").replace(")", ""): float(v) for k, v in metrics.items()},
            step=step,
        )

    def end(self, trainer):
        for f in Path(trainer.save_dir).glob("*"):
            if f.suffix in (".csv", ".png", ".jpg", ".yaml"):
                self.mlflow.log_artifact(str(f))
        self.mlflow.end_run()


class _WandbLogger:
    """reference callbacks/wb.py: run init + per-epoch metric dict."""

    def __init__(self, trainer):
        import wandb

        self.wandb = wandb
        self.run = wandb.init(
            project=getattr(trainer.args, "project", None) or "yolov10_3d_tpu",
            name=getattr(trainer.args, "name", None) or "train",
            config=trainer.args.to_dict(),
        )

    def metrics(self, metrics, step):
        self.run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def end(self, trainer):
        self.run.finish()


class _CometLogger:
    """reference callbacks/comet.py (minimal: params + metrics)."""

    def __init__(self, trainer):
        import comet_ml

        self.exp = comet_ml.Experiment(
            project_name=getattr(trainer.args, "project", None) or "yolov10_3d_tpu"
        )
        self.exp.log_parameters(trainer.args.to_dict())

    def metrics(self, metrics, step):
        self.exp.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def end(self, trainer):
        self.exp.end()


class _DVCLogger:
    """reference callbacks/dvc.py via dvclive."""

    def __init__(self, trainer):
        from dvclive import Live

        self.live = Live(str(Path(trainer.save_dir) / "dvclive"))
        for k, v in trainer.args.to_dict().items():
            self.live.log_param(k, str(v))

    def metrics(self, metrics, step):
        for k, v in metrics.items():
            self.live.log_metric(k, float(v))
        self.live.next_step()

    def end(self, trainer):
        self.live.end()


class _ClearMLLogger:
    """reference callbacks/clearml.py: Task.init + report_scalar per epoch."""

    def __init__(self, trainer):
        from clearml import Task

        self.task = Task.init(
            project_name=getattr(trainer.args, "project", None) or "yolov10_3d_tpu",
            task_name=getattr(trainer.args, "name", None) or "train",
            output_uri=False,
            auto_connect_frameworks={"pytorch": False, "matplotlib": False},
        )
        self.task.connect(dict(trainer.args.to_dict()), name="General")

    def metrics(self, metrics, step):
        for k, v in metrics.items():
            self.task.get_logger().report_scalar("train", k, float(v), step)

    def end(self, trainer):
        self.task.close()


class _NeptuneLogger:
    """reference callbacks/neptune.py: init_run + per-epoch appends."""

    def __init__(self, trainer):
        import neptune

        self.run = neptune.init_run(
            project=getattr(trainer.args, "project", None) or "yolov10_3d_tpu",
            name=getattr(trainer.args, "name", None) or "train",
        )
        self.run["Configuration/Hyperparameters"] = {
            k: str(v) for k, v in trainer.args.to_dict().items()
        }

    def metrics(self, metrics, step):
        for k, v in metrics.items():
            self.run[k].append(float(v), step=step)

    def end(self, trainer):
        self.run.stop()


class _RayTuneReporter:
    """reference callbacks/raytune.py: session.report metrics per fit epoch
    when running inside a Ray Tune trial."""

    def __init__(self, trainer):
        import ray
        from ray import train as ray_train

        if not ray.tune.is_session_enabled():
            raise RuntimeError("not in a Ray Tune session")
        self._report = ray_train.report

    def metrics(self, metrics, step):
        self._report({**metrics, "epoch": step})

    def end(self, trainer):
        pass


class _NotionLogger:
    """fork reference callbacks/notion_upload.py: push run args + per-epoch
    metrics to a Notion database (gated on notion-client + NOTION_TOKEN)."""

    def __init__(self, trainer):
        import os

        from notion_client import Client

        token = os.environ.get("NOTION_TOKEN")
        self.database_id = os.environ.get("NOTION_DATABASE_ID")
        if not token or not self.database_id:
            raise RuntimeError("NOTION_TOKEN/NOTION_DATABASE_ID not set")
        self.client = Client(auth=token)
        self.page = self.client.pages.create(
            parent={"database_id": self.database_id},
            properties={
                "Name": {"title": [{"text": {
                    "content": getattr(trainer.args, "name", None) or "train"}}]},
            },
        )

    def metrics(self, metrics, step):
        body = "\n".join(f"epoch {step} {k}: {v:.5g}" for k, v in metrics.items())
        self.client.blocks.children.append(
            self.page["id"],
            children=[{"paragraph": {"rich_text": [{"text": {"content": body[:1990]}}]}}],
        )

    def end(self, trainer):
        pass


_INTEGRATIONS = {
    "mlflow": _MLflowLogger,
    "wandb": _WandbLogger,
    "comet_ml": _CometLogger,
    "dvclive": _DVCLogger,
    "clearml": _ClearMLLogger,
    "neptune": _NeptuneLogger,
    "ray": _RayTuneReporter,
    "notion_client": _NotionLogger,
}


def add_integration_callbacks(trainer):
    """Attach available integrations (reference callbacks/base.py:188):
    TensorBoard (or TSV fallback) always; mlflow/wandb/comet/dvclive when
    importable — keyed off importability like the reference's SETTINGS
    toggles, with no network access attempted when absent."""
    tb = TensorBoardLogger(str(Path(trainer.save_dir) / "tb"))
    loggers = []
    for mod, cls in _INTEGRATIONS.items():
        try:
            __import__(mod)
        except ImportError:
            continue
        try:
            loggers.append(cls(trainer))
        except Exception:  # misconfigured integration must not kill training
            pass

    def on_epoch_end(tr):
        state = tr.state
        if state is None:
            return
        step = int(state.step)
        # best-effort: log whatever the trainer accumulated this epoch
        metrics = {}
        for k, v in getattr(tr, "last_metrics", {}).items():
            try:
                tb.scalar(k, float(v), step)
                metrics[k] = float(v)
            except (TypeError, ValueError):
                pass
        for lg in loggers:
            try:
                lg.metrics(metrics, step)
            except Exception:
                pass

    def on_end(tr):
        tb.close()
        for lg in loggers:
            try:
                lg.end(tr)
            except Exception:
                pass
        from .plotting import plot_results

        csv_path = Path(tr.save_dir) / "results.csv"
        if csv_path.exists():
            plot_results(csv_path)

    trainer.add_callback("on_train_epoch_end", on_epoch_end)
    trainer.add_callback("on_train_end", on_end)
    return trainer
