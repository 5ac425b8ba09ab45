"""Native checkpoint save/load.

Replaces the reference's pickled-nn.Module .pt files (trainer.py:514-541) with
a single msgpack file holding pytrees + a JSON metadata header: portable, no
arbitrary code execution on load. Torch .pt checkpoints remain loadable via
utils/torch_convert (the weight-converter surface, SURVEY.md §5.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

MAGIC = b"Y10TPU1\n"


def save_checkpoint(
    path,
    *,
    params: Any,
    batch_stats: Any = None,
    ema_params: Any = None,
    opt_state: Any = None,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """meta holds JSON-serializable config: model yaml dict/name, nc, names,
    epoch, best_fitness, train_args, date/version."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = {
        "params": params,
        "batch_stats": batch_stats or {},
        "ema_params": ema_params or {},
        "opt_state": opt_state if opt_state is not None else {},
    }
    tree = jax_to_numpy(tree)
    blob = serialization.msgpack_serialize(tree)
    header = json.dumps(meta or {}).encode()
    # atomic: write a sibling tmp then rename, so a preemption mid-write can
    # never leave a truncated last.ckpt (the whole point of frequent saves)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    tmp.replace(path)
    return str(path)


def load_checkpoint(path) -> Dict[str, Any]:
    """Returns {params, batch_stats, ema_params, opt_state, meta}."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a yolov10_3d_tpu checkpoint")
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        tree = serialization.msgpack_restore(f.read())
    tree["meta"] = meta
    return tree


def jax_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def strip_optimizer(path, out_path=None) -> str:
    """Post-training checkpoint slimming (reference torch_utils.py:451
    ``strip_optimizer``, called at trainer.py:656-666): drop the optimizer
    state, promote EMA weights to the canonical params, and halve weights to
    float16 for distribution. Roughly a 4x size cut."""
    ckpt = load_checkpoint(path)
    params = ckpt.get("ema_params") or ckpt["params"]

    def halve(x):
        x = np.asarray(x)
        return x.astype(np.float16) if x.dtype == np.float32 else x

    import jax

    meta = dict(ckpt.get("meta") or {})
    meta["stripped"] = True
    return save_checkpoint(
        out_path or path,
        params=jax.tree.map(halve, params),
        batch_stats=jax.tree.map(halve, ckpt.get("batch_stats") or {}),
        ema_params=None,
        opt_state=None,
        meta=meta,
    )


class AsyncCheckpointer:
    """Background-thread checkpoint writer (round-4 preemption story).

    The reference saves pickled modules synchronously at epoch end
    (trainer.py:514-541); on TPU pods the useful failure unit is the STEP —
    preemptions strike mid-epoch. Here the caller device_gets the state (the
    only part that must happen on the live train thread) and hands the host
    trees off; serialization + atomic write happen off-thread so the train
    loop never blocks on disk. One in-flight write per path family: a newer
    submit while busy queues at most one pending write per target and drops
    superseded ones (last-write-wins semantics — exactly what last.ckpt
    means). Errors surface on the next submit()/wait().
    """

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._pending: Dict[str, tuple] = {}
        self._error: Optional[BaseException] = None
        self._wake = threading.Event()
        self._stop = False
        self._idle = threading.Event()
        self._idle.set()
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def _run(self):
        while True:
            self._wake.wait()
            with self._lock:
                if not self._pending:
                    self._wake.clear()
                    self._idle.set()
                    if self._stop:
                        return
                    continue
                path, item = next(iter(self._pending.items()))
                del self._pending[path]
                self._idle.clear()
            try:
                save_checkpoint(path, **item)
            except BaseException as e:  # surfaced on next submit()/wait()
                with self._lock:
                    self._error = e
            finally:
                with self._lock:
                    if not self._pending:
                        self._idle.set()

    def _raise_pending_error(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, path, **save_kwargs):
        """Queue a write of already-host-resident trees (caller device_gets)."""
        self._raise_pending_error()
        with self._lock:
            self._pending[str(path)] = save_kwargs
            self._wake.set()

    def wait(self):
        """Drain all queued writes (call at train end / before reading back)."""
        import time as _time

        while True:
            with self._lock:
                empty = not self._pending
            if empty and self._idle.is_set():
                break
            _time.sleep(0.005)
        self._raise_pending_error()
