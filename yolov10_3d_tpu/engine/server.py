"""Dynamic-batching inference HTTP server, zero-dependency (stdlib).

The reference serves through a Gradio demo (``app.py``) and the HUB SaaS
deploy surface; a TPU deployment wants a batching front end instead: the
jitted fixed-shape forward amortizes best at large batch (bench.py: B=128
measured >2x the per-image throughput of B=1..8 on the low-channel stem
layers), so concurrent requests are coalesced into ONE device batch — the
same dynamic-batching contract as TF Serving / Triton (``max_batch`` or
``max_delay_ms``, whichever fills/fires first).

Endpoints:
  POST /predict   body = raw image bytes (jpeg/png/bmp); query params
                  ``conf`` (>= the server floor, applied as a post-filter so
                  mixed-conf requests can share one device batch) and
                  ``classes`` (csv ints). Response JSON: ``detections``
                  (Results.summary rows incl. 3D payloads), ``shape``,
                  ``batched_with`` (device batch size this request rode in),
                  ``ms`` (enqueue->result wall time).
  GET  /health    liveness + model identity
  GET  /stats     request/batch counters, batch-size histogram, latency
                  percentiles — the observability a load test needs.

Binds 127.0.0.1 by default (same stance as the explorer dashboard: nothing
here authenticates).
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from urllib.parse import parse_qs, urlparse

import numpy as np


class _Pending:
    __slots__ = ("img", "conf", "classes", "event", "result", "error", "t0", "batch")

    def __init__(self, img, conf, classes):
        self.img = img
        self.conf = conf
        self.classes = classes
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t0 = time.perf_counter()
        self.batch = 0


class DynamicBatcher:
    """Coalesce concurrent single-image requests into one predictor call.

    The predictor runs at the server's conf floor; per-request ``conf`` is a
    host-side post-filter (so requests with different thresholds still share
    a batch — the device work is identical, only the cut differs).
    """

    def __init__(self, predictor, imgsz, conf_floor: float = 0.25,
                 max_batch: int = 32, max_delay_ms: float = 10.0):
        self.predictor = predictor
        self.imgsz = imgsz
        self.conf_floor = float(conf_floor)
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1e3
        # jitted forwards compile per batch size; pad every window up to the
        # next allowed size so the compile set is log2(max_batch)+1 shapes,
        # not max_batch (TF Serving's allowed_batch_sizes, for the same
        # reason — review finding: unpadded windows recompiled per size).
        # Under a dp mesh every bucket must divide across the axis, so the
        # ladder starts at the mesh size.
        base = getattr(predictor, "mesh", None)
        base = base.size if base is not None else 1
        self.max_batch = -(-max(self.max_batch, base) // base) * base
        self.allowed = [base]
        while self.allowed[-1] < self.max_batch:
            self.allowed.append(min(self.allowed[-1] * 2, self.max_batch))
        self.queue: Queue = Queue()
        self.lock = threading.Lock()
        self.stats = {"requests": 0, "images": 0, "batches": 0, "errors": 0}
        self.batch_hist: dict = {}
        self.latencies = deque(maxlen=1000)  # seconds, enqueue -> done
        self._stop = threading.Event()
        self.worker = threading.Thread(target=self._loop, daemon=True)
        self.worker.start()

    # -- client side ----------------------------------------------------------
    def submit(self, img: np.ndarray, conf=None, classes=None, timeout=60.0):
        p = _Pending(img, conf, classes)
        with self.lock:
            self.stats["requests"] += 1
        self.queue.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if p.error is not None:
            raise p.error
        return p

    # -- worker side ----------------------------------------------------------
    def _drain(self):
        """Block for the first request, then fill the batch until max_batch
        or max_delay_ms after the first arrival."""
        first = self.queue.get()  # blocks
        batch = [first]
        deadline = time.perf_counter() + self.max_delay
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._drain()
            stopping = None in batch  # sentinel may land mid-window
            batch = [p for p in batch if p is not None]
            if not batch:
                if stopping:
                    return
                continue
            n = len(batch)
            # pad to the next allowed device batch (results sliced back)
            size = next(s for s in self.allowed if s >= n)
            imgs = [p.img for p in batch] + [batch[0].img] * (size - n)
            try:
                results = self.predictor(
                    imgs, batch_size=size, conf=self.conf_floor, imgsz=self.imgsz
                )
                for p, r in zip(batch, results):
                    p.result = r
                    p.batch = size
            except Exception as e:  # surface to every waiter in the batch
                for p in batch:
                    p.error = e
                with self.lock:
                    self.stats["errors"] += n
            now = time.perf_counter()
            with self.lock:
                self.stats["batches"] += 1
                self.stats["images"] += n
                self.batch_hist[size] = self.batch_hist.get(size, 0) + 1
                for p in batch:
                    self.latencies.append(now - p.t0)
            for p in batch:
                p.event.set()
            if stopping:
                return

    def stop(self):
        self._stop.set()
        self.queue.put(None)  # wake the blocking get

    def snapshot(self):
        with self.lock:
            lat = sorted(self.latencies)
            pct = lambda q: round(lat[int(q * (len(lat) - 1))] * 1e3, 2) if lat else None
            return {
                **self.stats,
                "batch_hist": {str(k): v for k, v in sorted(self.batch_hist.items())},
                "latency_ms": {"p50": pct(0.50), "p90": pct(0.90), "p99": pct(0.99)},
            }


class InferenceServer:
    """HTTP front end over a :class:`DynamicBatcher`."""

    def __init__(self, model, imgsz=640, conf: float = 0.25,
                 max_batch: int = 32, max_delay_ms: float = 10.0,
                 devices: int = 1):
        """``model``: a ``YOLO`` facade (engine/model.py). The predictor is
        built once; its jit cache compiles per input shape, so the server
        letterboxes everything to ``imgsz``. ``devices`` > 1 serves
        data-parallel over a dp mesh: variables replicated, every device
        batch sharded on its leading dim (batch buckets become multiples of
        ``devices``); 0 means all local devices."""
        from .predictor import Predictor

        self.model = model
        mesh = None
        if devices != 1:
            import jax as _jax

            from ..parallel.mesh import get_mesh

            avail = len(_jax.devices())
            n = avail if devices == 0 else int(devices)
            if n > avail:  # get_mesh silently clamps; a deploy flag must not
                raise ValueError(
                    f"devices={n} requested but only {avail} present "
                    f"(platform {_jax.devices()[0].platform})"
                )
            mesh = get_mesh(n)
        args = model._cfg({"conf": conf, "imgsz": imgsz})
        self.predictor = Predictor(
            model.model, model.spec, model.variables, args, model.names,
            mesh=mesh,
        )
        self.model_name = str(getattr(model, "model_name", "") or model.task)
        self.batcher = DynamicBatcher(
            self.predictor, imgsz, conf_floor=conf,
            max_batch=max_batch, max_delay_ms=max_delay_ms,
        )
        self.server = None

    def warmup(self):
        """Compile the serving forward for EVERY allowed device batch before
        the first request lands — an unwarmed bucket compiling mid-traffic
        blocks the worker for the full XLA compile and times out everything
        queued behind it (measured: p99 jumped to 58 s on the first 8-bucket
        window in tools/exp_serve_load.py)."""
        sz = self.batcher.imgsz
        hw = (sz, sz) if isinstance(sz, int) else tuple(sz)
        img = np.zeros((*hw, 3), np.uint8)
        for size in self.batcher.allowed:
            self.predictor(
                [img] * size, batch_size=size,
                conf=self.batcher.conf_floor, imgsz=self.batcher.imgsz,
            )

    # -- request handling -------------------------------------------------------
    def _predict(self, body: bytes, q: dict) -> dict:
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
        conf = q.get("conf", [None])[0]
        conf = None if conf is None else float(conf)
        if conf is not None and conf < self.batcher.conf_floor:
            raise ValueError(
                f"conf {conf} below the server floor {self.batcher.conf_floor} "
                "(start the server with a lower conf=)"
            )
        classes = q.get("classes", [None])[0]
        classes = (
            None if not classes else {int(c) for c in classes.split(",")}
        )
        p = self.batcher.submit(img, conf=conf, classes=classes)
        rows = p.result.summary()
        if conf is not None:
            rows = [r for r in rows if r["confidence"] >= conf]
        if classes is not None:
            rows = [r for r in rows if r["class"] in classes]
        return {
            "detections": rows,
            "shape": list(img.shape[:2]),
            "batched_with": p.batch,
            "ms": round((time.perf_counter() - p.t0) * 1e3, 2),
        }

    def _handler(self):
        srv = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/health":
                    return self._send(
                        200,
                        {"status": "ok", "model": srv.model_name,
                         "task": srv.predictor.task,
                         "imgsz": srv.batcher.imgsz},
                    )
                if u.path == "/stats":
                    return self._send(200, srv.batcher.snapshot())
                return self._send(404, {"error": "not found"})

            def do_POST(self):
                u = urlparse(self.path)
                if u.path != "/predict":
                    return self._send(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    if n <= 0:
                        raise ValueError("empty body (send raw image bytes)")
                    out = srv._predict(self.rfile.read(n), parse_qs(u.query))
                    return self._send(200, out)
                except (ValueError, OSError) as e:  # bad image/params
                    return self._send(400, {"error": f"{type(e).__name__}: {e}"})
                except Exception as e:
                    return self._send(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler

    # -- lifecycle ----------------------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 8000,
              blocking: bool = True, warmup: bool = True):
        """``port=0`` picks a free port. Non-blocking mode runs on a daemon
        thread and returns the server (``.shutdown()`` to stop)."""
        if warmup:
            self.warmup()
        self.server = ThreadingHTTPServer((host, port), self._handler())
        if blocking:
            try:
                print(
                    f"inference server: http://{host}:{self.server.server_address[1]}"
                    f"  (model={self.model_name}, imgsz={self.batcher.imgsz}, "
                    f"max_batch={self.batcher.max_batch})"
                )
                self.server.serve_forever()
            finally:
                self.server.server_close()
                self.batcher.stop()
        else:
            t = threading.Thread(target=self.server.serve_forever, daemon=True)
            t.start()
        return self.server

    def stop(self):
        if self.server is not None:
            self.server.shutdown()
            self.server.server_close()
        self.batcher.stop()
