#!/usr/bin/env python
"""Load-test the dynamic-batching inference server on the real chip.

Measures what bench.py's raw forward number leaves out: JPEG decode, HTTP,
host preprocess, dynamic-batch coalescing, and the JSON epilogue — the
throughput a deployment actually sees. Runs the InferenceServer in-process
(ThreadingHTTPServer), fires N concurrent keep-alive clients at /predict
with a fixed 640x480 JPEG for DURATION seconds per concurrency level, and
reports qps + the server's own /stats (device batch histogram, p50/p90/p99
enqueue->result latency).

Usage: python tools/exp_serve_load.py [model_yaml] [imgsz] [duration_s] [max_batch]

Measured on the axon-tunneled v5e (2026-08-19): ~10 img/s at 1 client,
~18 img/s at 128 clients with p50 ~3 s — and a pure-H2D probe shows why:
the tunnel moves 50-90 MB/s, so one B=32 uint8 window (29.5 MB) pays
300-600 ms of transfer before any compute. The serving stack is
HOST-TO-DEVICE-LINK-bound on this box, not device- or framework-bound; on
a real TPU host (PCIe/DMA, tens of GB/s) the same window's H2D is ~3 ms
against a ~11 ms forward. jpeg decode costs 13.7 ms/img of host CPU and
parallelizes across handler threads. The fixes this test drove (batched
device_get — per-array readbacks paid one ~15 ms tunnel RTT each — and
pre-warming every allowed batch bucket) are real-host wins too.
"""

import io
import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    model_yaml = sys.argv[1] if len(sys.argv) > 1 else (
        "yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml"
    )
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    duration = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from PIL import Image

    from yolov10_3d_tpu.engine.model import YOLO
    from yolov10_3d_tpu.engine.server import InferenceServer

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(
        rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    ).save(buf, format="JPEG", quality=85)
    body = buf.getvalue()
    print(f"payload: {len(body)/1024:.0f} KiB jpeg, model={model_yaml}", flush=True)

    srv = InferenceServer(
        YOLO(model_yaml), imgsz=imgsz, conf=0.25, max_batch=int(sys.argv[4]) if len(sys.argv) > 4 else 32, max_delay_ms=8.0
    )
    http = srv.serve(port=0, blocking=False, warmup=True)
    base = f"http://127.0.0.1:{http.server_address[1]}"

    def hammer(stop, counter):
        while not stop.is_set():
            try:
                req = urllib.request.Request(
                    base + "/predict", data=body, method="POST"
                )
                with urllib.request.urlopen(req, timeout=300) as r:
                    json.loads(r.read())
                counter[0] += 1
            except Exception:
                counter[1] += 1

    try:
        for clients in (1, 8, 32, 64, 128):
            # drain stats between levels
            stop = threading.Event()
            counters = [[0, 0] for _ in range(clients)]
            threads = [
                threading.Thread(target=hammer, args=(stop, counters[i]), daemon=True)
                for i in range(clients)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            # first level includes per-bucket compiles; run a warm lap first
            time.sleep(duration)
            stop.set()
            for t in threads:
                t.join(timeout=300)
            dt = time.perf_counter() - t0
            n = sum(c[0] for c in counters)
            errs = sum(c[1] for c in counters)
            stats = json.loads(
                urllib.request.urlopen(base + "/stats", timeout=60).read()
            )
            print(
                f"clients={clients:3d}  {n/dt:8.1f} img/s  "
                f"p50={stats['latency_ms']['p50']}ms "
                f"p99={stats['latency_ms']['p99']}ms  "
                f"errs={errs}  hist={stats['batch_hist']}",
                flush=True,
            )
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
