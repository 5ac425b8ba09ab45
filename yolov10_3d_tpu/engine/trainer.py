"""Training driver (reference: engine/trainer.py ``BaseTrainer``).

The hot loop is the jitted sharded train step (train/state.py); this host
driver handles: dataset/loader build, LR schedule wiring, per-epoch val gated
by val_period, last/best checkpointing by fitness, results.csv, early
stopping, close_mosaic, and HTL loss weighting hooks. No DDP subprocess
relaunch — multi-chip comes from the dp mesh (parallel/mesh.py).
"""

from __future__ import annotations

import csv
import math
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import Config, get_cfg, load_dataset_yaml
from ..data.dataset import DataLoader, YOLODataset
from ..nn.build import build_model
from ..parallel.mesh import (
    get_mesh, make_parallel_train_step, replicate_state, shard_batch,
)
from ..train.optim import build_optimizer
from ..train.state import TrainState, eval_variables, make_train_step
from ..utils import LOGGER
from ..utils.checkpoint import save_checkpoint
from .validator import DetectionValidator


class EarlyStopping:
    """Fitness-plateau stopper (reference torch_utils.py:553)."""

    def __init__(self, patience: int = 50):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience


class DetectionTrainer:
    """2D detection trainer. The 3D trainer subclasses and swaps dataset+loss."""

    def __init__(self, cfg: Optional[Config] = None, overrides: Optional[Dict] = None):
        self.args = cfg if isinstance(cfg, Config) else get_cfg(cfg, overrides or {})
        self.save_dir = Path(self.args.get("save_dir") or "runs/train")
        self.state = None
        self.callbacks: Dict[str, list] = {}

    # -- hooks (reference callbacks/base.py event names) --
    def add_callback(self, event: str, fn: Callable):
        self.callbacks.setdefault(event, []).append(fn)

    def run_callbacks(self, event: str):
        for fn in self.callbacks.get(event, []):
            fn(self)

    # -- task plugins override these (reference task_map) --
    def _device_aug_active(self) -> bool:
        """device_aug is usable only when the hyps are XLA-expressible; the
        dataset (tiles mode) and the train step (tile preprocess) must agree
        on this decision or the step crashes on the wrong batch keys."""
        if not self.args.get("device_aug"):
            return False
        return not any(
            float(self.args.get(k, 0.0) or 0.0)
            for k in ("degrees", "shear", "perspective")
        )

    def build_dataset(self, path, mode: str):
        imgsz = self.args.imgsz
        return YOLODataset(
            path,
            imgsz=imgsz,
            augment=(mode == "train"),
            hyp=self.args.to_dict(),
            fraction=self.args.fraction if mode == "train" else 1.0,
            single_cls=self.args.single_cls,
            seed=self.args.seed,
            cache=self.args.get("cache") or None,
            device_aug=self._device_aug_active() and mode == "train",
        )

    def make_preprocess_fn(self, spec):
        """Device-aug hook fused into the jitted step (ops/device_aug.py);
        active when args.device_aug and the host aug hyps are XLA-expressible
        (no rotation/shear/perspective)."""
        args = self.args
        if not self._device_aug_active():
            if args.get("device_aug"):
                from ..utils import LOGGER

                LOGGER.warning(
                    "device_aug=True ignored: degrees/shear/perspective require "
                    "the host pipeline (dataset stays in host-aug mode)"
                )
            return None
        import jax

        from ..ops.device_aug import device_train_augment

        imgsz = args.imgsz
        hw = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
        gains = (args.get("hsv_h", 0.015), args.get("hsv_s", 0.7), args.get("hsv_v", 0.4))
        key = jax.random.PRNGKey(args.seed)

        def preprocess(batch, step):
            out = device_train_augment(
                batch["tiles"], batch["tile_labels"], batch["tile_mask"],
                jax.random.fold_in(key, step),
                out_hw=hw, crop_hw=hw, max_boxes=batch["tile_labels"].shape[2],
                hsv_gains=gains, fliplr=float(args.get("fliplr", 0.5)),
            )
            return {**{k: v for k, v in batch.items()
                       if k not in ("tiles", "tile_labels", "tile_mask")}, **out}

        return preprocess

    def make_loss(self, spec):
        from ..train.loss import v10_detect_loss

        gains = (self.args.box, self.args.cls, self.args.dfl)

        def loss_fn(preds, batch):
            return v10_detect_loss(
                preds, batch, nc=spec.nc, strides=spec.strides, gains=gains,
                one2many_topk=10,
            )

        return loss_fn

    def make_head_kwargs_fn(self, spec):
        """Optional per-batch extra head inputs (RT-DETR denoising)."""
        return None

    def get_validator(self, names):
        """Validator factory (reference task_map ``validator`` slot,
        engine/model.py:816); the 3D trainer swaps in Detection3DValidator."""
        return DetectionValidator(self.model, self.spec, self.args, names)

    def run_val(self, state, val_ds, batch_size: int) -> Dict[str, float]:
        """Per-epoch validation (reference trainer.py:445-447). Returns the
        metrics dict with a ``fitness`` key."""
        val_loader = DataLoader(
            val_ds, batch_size, shuffle=False, drop_last=False,
            num_threads=self.args.workers, rect=bool(self.args.get("rect")),
        )
        return self.validator(eval_variables(state), val_loader)

    def epoch_batch_extras(self, epoch: int) -> Dict:
        """Per-epoch arrays merged into every train batch (constant keys so
        the jitted step never retraces). The 3D trainer injects HTL weights."""
        return {}

    def transform_batch(self, b: Dict) -> Dict:
        """Host-side per-batch hook before device transfer (the 3D trainer
        adds frozen-teacher embeddings for distillation here)."""
        return b

    def extra_ckpt_meta(self) -> Dict:
        """Task-specific JSON-serializable state merged into ckpt meta (the
        3D trainer persists the HTL ramp here so resume continues it)."""
        return {}

    def on_resume_meta(self, meta: Dict):
        """Hook: restore task-specific state from a resumed ckpt's meta."""

    def on_epoch_losses(self, items: Dict[str, float]):
        """Epoch-mean loss terms callback (HTL history in the 3D trainer)."""

    def init_params(self, model, spec, variables):
        """Head bias init (reference bias_init); tasks override."""
        from ..nn.heads import detect_bias_init
        import flax

        params = flax.core.unfreeze(variables["params"])
        head_key = f"model_{spec.head_index}"
        if head_key in params:
            params[head_key] = detect_bias_init(params[head_key], spec.nc, spec.strides)
        return {**variables, "params": params}

    # -- main --
    def train(self):
        args = self.args
        data = load_dataset_yaml(args.data)
        names = data["names"]
        nc = data["nc"]

        model, spec = build_model(args.model, nc=nc)
        self.model, self.spec = model, spec

        imgsz = args.imgsz
        hw = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
        x0 = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(args.seed), x0, train=False
        )
        variables = self.init_params(model, spec, variables)

        root = Path(data.get("path", "."))
        train_ds = self.build_dataset(root / data["train"], "train")
        self.train_ds = train_ds  # observable by callbacks (close_mosaic/mixup)
        val_ds = self.build_dataset(root / data["val"], "val") if args.val else None

        n_dev = len(jax.devices())
        batch = args.batch - (args.batch % n_dev) if args.batch >= n_dev else n_dev
        loader = DataLoader(
            train_ds, batch, shuffle=True, seed=args.seed, num_threads=args.workers,
            # cfg knobs (default.yaml rect/multi_scale) — rect batches a few
            # static shapes; multi_scale resizes per batch from a fixed ladder
            rect=bool(args.get("rect")),
            multi_scale=bool(args.get("multi_scale")),
        )
        steps_per_epoch = max(len(loader), 1)

        # optimizer=auto: the reference's fitted rule (trainer.py:757-764) —
        # SGD for long runs, AdamW with an nc-fitted lr for short ones, and
        # bias warmup capped at 0 (Adam can't take the 0.1 bias warmup spike)
        opt_name, lr0, mom = args.optimizer, args.lr0, args.momentum
        warmup_bias_lr = float(args.get("warmup_bias_lr", 0.1) or 0.0)
        if str(opt_name).lower() == "auto":
            from ..train.optim import resolve_auto_optimizer

            opt_name, lr0, mom, warmup_bias_lr = resolve_auto_optimizer(
                spec.nc, len(train_ds), batch, args.nbs, args.epochs
            )
            LOGGER.info(
                f"optimizer: 'auto' -> {opt_name}(lr={lr0}, momentum={mom})"
            )

        tx, lr_fn = build_optimizer(
            variables["params"],
            name=opt_name,
            lr0=lr0,
            lrf=args.lrf,
            momentum=mom,
            weight_decay=args.weight_decay,
            epochs=args.epochs,
            steps_per_epoch=steps_per_epoch,
            warmup_epochs=args.warmup_epochs,
            cos_lr=args.cos_lr,
            nbs=args.nbs,
            batch_size=batch,
            warmup_bias_lr=warmup_bias_lr,
            warmup_momentum=float(args.get("warmup_momentum", 0.8) or 0.0),
        )
        step_fn = make_train_step(
            model, tx, nc=spec.nc, strides=spec.strides,
            compute_dtype=jnp.bfloat16 if args.amp else jnp.float32,
            loss_fn=self.make_loss(spec),
            head_kwargs_fn=self.make_head_kwargs_fn(spec),
            preprocess_fn=self.make_preprocess_fn(spec),
        )
        state = TrainState.create(variables, tx)

        start_epoch = 0
        resume_path = None
        resumed_best = None
        skip_batches = 0
        if args.resume:
            cand = self.save_dir / "weights" / "last.ckpt"
            resume_path = args.resume if isinstance(args.resume, str) else str(cand)
            if Path(resume_path).exists():
                state, start_epoch, resumed_meta = self.load_resume(resume_path, state)
                resumed_best = resumed_meta.get("best_fitness")
                # step-granular resume (round 4): a mid-epoch ckpt records how
                # many batches of its epoch already ran; re-enter THAT epoch
                # and skip them (the loader's per-epoch order is seeded)
                skip_batches = int(resumed_meta.get("batches_done", 0))
                if skip_batches:
                    start_epoch = int(resumed_meta.get("epoch", start_epoch))
                self.on_resume_meta(resumed_meta)
            else:
                resume_path = None

        mesh = get_mesh() if n_dev > 1 else None
        if mesh is not None:
            pstep = make_parallel_train_step(step_fn, mesh)
            state = replicate_state(state, mesh)
        else:
            pstep = jax.jit(step_fn, donate_argnums=0)

        self.validator = self.get_validator(names)
        stopper = EarlyStopping(args.patience)
        # first epoch writes best.ckpt (trainer.py:448-452) — except on
        # resume, where the checkpointed best must not be clobbered by a
        # worse first-resumed-epoch fitness (caught in review)
        best_fitness = resumed_best if resumed_best else None
        csv_path = self.save_dir / "results.csv"
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.run_callbacks("on_train_start")

        epochs = args.epochs
        for epoch in range(start_epoch, epochs):
            if (
                args.close_mosaic
                and epoch == epochs - args.close_mosaic
                # classify datasets have no mosaic stage (found by the
                # classify overfit proof: 30 epochs crossed the default
                # close_mosaic=10 boundary for the first time)
                and hasattr(train_ds, "close_mosaic")
            ):
                train_ds.close_mosaic()
            if (
                args.get("close_mixup", 0)
                and epoch == epochs - args.close_mixup
                # reference trainer.py:368-371 + :730-732: mixup is closed at
                # its OWN epoch boundary, independently of close_mosaic, by
                # zeroing the dataset's mixup attribute (KITTI-style datasets
                # carry one; 2D YOLODataset mixup lives inside the transform
                # pipeline and is untouched, matching the reference hasattr).
                and hasattr(train_ds, "mixup")
            ):
                train_ds.mixup = 0.0
                LOGGER.info("Disabled mixup on dataset")
            self.epoch = epoch  # surfaced for callbacks (reference trainer.py:356)
            # fresh deterministic shuffle per epoch (loader seeds with
            # seed+epoch; without this every epoch replays epoch-0's order —
            # round-4 find). Also what makes mid-epoch resume replay exact.
            loader.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            extras = self.epoch_batch_extras(epoch)
            t0 = time.time()
            sums = None  # device-side running sums: no per-step host sync
            nb = 0       # loader position (incl. skipped) — ckpt alignment
            n_run = 0    # batches actually stepped — loss-mean denominator
            ckpt_every = int(args.get("ckpt_period_steps", 0) or 0)
            for b in loader:
                if skip_batches > 0:  # step-granular resume: replay position
                    skip_batches -= 1
                    nb += 1
                    continue
                b = self.transform_batch(b)
                b = {k: jnp.asarray(v) for k, v in {**b, **extras}.items()}
                if mesh is not None:
                    b = shard_batch(b, mesh)
                state, metrics = pstep(state, b)
                sums = metrics if sums is None else jax.tree.map(jnp.add, sums, metrics)
                nb += 1
                n_run += 1
                if ckpt_every and nb % ckpt_every == 0 and args.save:
                    # preemption-safe mid-epoch ckpt: async, atomic,
                    # step-granular resume point (exceeds the reference's
                    # epoch-granular last.pt, trainer.py:514-541)
                    self.save_ckpt(
                        self.save_dir / "weights" / "last.ckpt", state,
                        {"epoch": epoch, "batches_done": nb,
                         "best_fitness": best_fitness or 0.0,
                         "model_yaml": str(args.model), "nc": nc,
                         "names": {int(k): v for k, v in names.items()},
                         **self.extra_ckpt_meta()},
                    )
            self.state = state

            # epoch means (reference trainer.py:429-433 tloss running mean)
            agg = (
                {k: float(v) / n_run for k, v in jax.device_get(sums).items()}
                if sums is not None else {}
            )
            if agg and not all(math.isfinite(v) for v in agg.values()):
                bad = {k: v for k, v in agg.items() if not math.isfinite(v)}
                LOGGER.warning(
                    f"non-finite loss terms at epoch {epoch}: {bad} (all terms: {agg})"
                )  # NaN watch (reference loss.py:954-961)
            self.on_epoch_losses(agg)

            row = {"epoch": epoch, "time": time.time() - t0, **agg,
                   "lr": float(lr_fn(state.step))}
            self.last_metrics = row
            fitness = 0.0
            if val_ds is not None and (epoch + 1) % max(args.val_period, 1) == 0:
                results = self.run_val(state, val_ds, batch)
                fitness = results["fitness"]
                row.update({k: v for k, v in results.items() if np.isscalar(v)})
            self._write_csv(csv_path, row)
            # fires every epoch after train+val metrics land (reference
            # trainer.py:475 — this is the event the TB/W&B loggers key off)
            self.run_callbacks("on_fit_epoch_end")

            # fitness tracking happens regardless of args.save (Model.tune
            # reads best_fitness with saving off); meta is built AFTER the
            # update so last.ckpt never records a stale best that a resume
            # would use to clobber best.ckpt
            improved = best_fitness is None or fitness > best_fitness
            if improved:
                best_fitness = fitness
            if args.save:
                meta = {
                    "epoch": epoch, "best_fitness": best_fitness or 0.0,
                    "model_yaml": str(args.model), "nc": nc,
                    "names": {int(k): v for k, v in names.items()},
                    "train_args": {k: v for k, v in args.to_dict().items()
                                   if isinstance(v, (int, float, str, bool, list, type(None)))},
                    **self.extra_ckpt_meta(),
                }
                self.save_ckpt(self.save_dir / "weights" / "last.ckpt", state, meta)
                if improved:
                    self.save_ckpt(self.save_dir / "weights" / "best.ckpt", state, meta)
                if args.save_period > 0 and (epoch + 1) % args.save_period == 0:
                    self.save_ckpt(self.save_dir / "weights" / f"epoch{epoch}.ckpt", state, meta)
                self.run_callbacks("on_model_save")

            self.run_callbacks("on_train_epoch_end")
            if stopper(epoch, fitness):
                break
        self.best_fitness = best_fitness or 0.0  # surfaced for Model.tune
        if getattr(self, "_ckpt_writer", None) is not None:
            self._ckpt_writer.wait()  # drain async writes before returning
        self.run_callbacks("on_train_end")
        return self.state

    @property
    def ckpt_writer(self):
        if getattr(self, "_ckpt_writer", None) is None:
            from ..utils.checkpoint import AsyncCheckpointer

            self._ckpt_writer = AsyncCheckpointer()
        return self._ckpt_writer

    def save_ckpt(self, path, state: TrainState, meta):
        """Async checkpoint: device_get here (the only device-side part),
        serialize + atomic write on the background thread — the train loop
        never blocks on disk (round-4 preemption story; the reference saves
        pickled modules synchronously, trainer.py:514-541)."""
        from flax import serialization

        host = jax.device_get
        meta = {**meta, "step": int(state.step)}
        self.ckpt_writer.submit(
            path,
            params=host(state.params),
            batch_stats=host(state.batch_stats),
            ema_params=host(state.ema_params),
            opt_state=serialization.to_state_dict(host(state.opt_state)),
            meta=meta,
        )

    @staticmethod
    def load_resume(path, state: TrainState):
        """Restore params/EMA/BN/optimizer/step from last.ckpt (reference
        trainer.py:668-728 resume semantics)."""
        from flax import serialization

        from ..utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        opt_state = state.opt_state
        if ckpt.get("opt_state"):
            opt_state = serialization.from_state_dict(state.opt_state, ckpt["opt_state"])
        new_state = state.replace(
            step=jnp.asarray(int(ckpt["meta"].get("step", 0)), jnp.int32),
            params=ckpt["params"],
            batch_stats=ckpt.get("batch_stats") or state.batch_stats,
            ema_params=ckpt.get("ema_params") or ckpt["params"],
            opt_state=opt_state,
        )
        return new_state, int(ckpt["meta"].get("epoch", -1)) + 1, ckpt["meta"]

    @staticmethod
    def _write_csv(path: Path, row: Dict):
        """Append a row, growing the header when new columns appear.

        Validation epochs add metrics/* columns that pure-train epochs lack;
        with val_period > 1 the first row's header is missing them and a
        fixed-fieldnames append silently misaligns every val row (found by
        the 3D overfit probe: its AP column landed unlabeled). On schema
        growth, rewrite the file under the union header."""
        if path.exists():
            with open(path, newline="") as f:
                rows = list(csv.DictReader(f))
            fields = list(rows[0].keys()) if rows else []
            new = [k for k in row if k not in fields]
            if new:
                fields = fields + new
                with open(path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=fields, restval="")
                    w.writeheader()
                    w.writerows(rows)
                    w.writerow(row)
                return
            with open(path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=fields, restval="").writerow(row)
            return
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            w.writeheader()
            w.writerow(row)
