"""Dynamic-batching inference server (engine/server.py): live-HTTP tests
over a tiny model, mirroring the explorer-dashboard test style.

Covers: health/stats endpoints, a real image predict round trip (JSON
detections), request coalescing into one device batch (the core serving
contract), per-request conf/classes filters + the conf-floor guard, the 3D
summary payload, and malformed-input error paths.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from yolov10_3d_tpu.engine.model import YOLO
from yolov10_3d_tpu.engine.server import InferenceServer

IMGSZ = 64


def _jpeg_bytes(rng, hw=(80, 60)):
    from PIL import Image

    arr = (rng.uniform(0, 255, (*hw, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _post(url, body, timeout=120):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    model = YOLO("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    srv = InferenceServer(
        model, imgsz=IMGSZ, conf=0.001, max_batch=8, max_delay_ms=200.0
    )
    http = srv.serve(port=0, blocking=False, warmup=True)
    base = f"http://127.0.0.1:{http.server_address[1]}"
    yield base, srv
    srv.stop()


def test_health_and_predict(server):
    base, _ = server
    h = _get(base + "/health")
    assert h["status"] == "ok" and h["task"] == "detect"
    out = _post(base + "/predict", _jpeg_bytes(np.random.default_rng(0)))
    assert out["shape"] == [80, 60] and out["batched_with"] >= 1
    assert isinstance(out["detections"], list)
    if out["detections"]:  # untrained net: sigmoid ~0.5 scores pass conf=0.001
        d = out["detections"][0]
        assert {"name", "class", "confidence", "box"} <= set(d)
        assert set(d["box"]) == {"x1", "y1", "x2", "y2"}


def test_requests_coalesce_into_one_batch(server):
    base, srv = server
    n0 = srv.batcher.stats["batches"]
    rng = np.random.default_rng(1)
    bodies = [_jpeg_bytes(rng) for _ in range(4)]
    outs = [None] * 4
    # max_delay_ms=200 gives the threads time to land in the same window
    def hit(i):
        outs[i] = _post(base + "/predict", bodies[i])

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(o is not None for o in outs)
    assert max(o["batched_with"] for o in outs) >= 2  # coalescing happened
    st = _get(base + "/stats")
    assert st["images"] >= 5 and st["batches"] > n0
    assert st["latency_ms"]["p50"] is not None
    # batch_hist records padded DEVICE batches (allowed sizes only), so its
    # weighted sum bounds the actual image count from above
    assert all(int(k) in {1, 2, 4, 8} for k in st["batch_hist"])
    assert sum(int(k) * v for k, v in st["batch_hist"].items()) >= st["images"]


def test_conf_and_classes_filters(server):
    base, _ = server
    body = _jpeg_bytes(np.random.default_rng(2))
    full = _post(base + "/predict", body)
    cut = _post(base + "/predict?conf=0.9", body)
    assert len(cut["detections"]) <= len(full["detections"])
    assert all(d["confidence"] >= 0.9 for d in cut["detections"])
    only0 = _post(base + "/predict?classes=0", body)
    assert all(d["class"] == 0 for d in only0["detections"])
    # below the server floor -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict?conf=0.0001", body)
    assert e.value.code == 400


def test_malformed_inputs(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", b"")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/nope")
    assert e.value.code == 404


def test_data_parallel_serving_matches_single_device():
    """devices=4 over the virtual CPU mesh: buckets become multiples of the
    mesh size (every device batch divides across the dp axis) and the
    detections equal the single-device server's for the same image."""
    body = _jpeg_bytes(np.random.default_rng(9), hw=(64, 64))
    outs = {}
    for devices in (1, 4):
        model = YOLO("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
        srv = InferenceServer(
            model, imgsz=IMGSZ, conf=0.001, max_batch=8,
            max_delay_ms=5.0, devices=devices,
        )
        if devices == 4:
            assert srv.batcher.allowed == [4, 8]
            assert srv.predictor.mesh is not None
        http = srv.serve(port=0, blocking=False, warmup=True)
        base = f"http://127.0.0.1:{http.server_address[1]}"
        try:
            out = _post(base + "/predict", body)
            if devices == 4:
                assert out["batched_with"] % 4 == 0
            outs[devices] = out["detections"]
        finally:
            srv.stop()
    assert len(outs[1]) == len(outs[4])
    # identical weights (seeded init), identical math modulo dp partition
    for a, b in zip(outs[1], outs[4]):
        assert a["class"] == b["class"]
        assert abs(a["confidence"] - b["confidence"]) < 1e-5
        for k in a["box"]:
            assert abs(a["box"][k] - b["box"][k]) < 1e-2


def test_3d_payload():
    model = YOLO("yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml")
    srv = InferenceServer(
        model, imgsz=[64, 96], conf=0.001, max_batch=2, max_delay_ms=5.0
    )
    http = srv.serve(port=0, blocking=False, warmup=True)
    base = f"http://127.0.0.1:{http.server_address[1]}"
    try:
        h = _get(base + "/health")
        assert h["task"] == "detect3d"
        out = _post(base + "/predict", _jpeg_bytes(np.random.default_rng(3)))
        assert out["detections"], "3D head with conf floor 0.001 must emit rows"
        d = out["detections"][0]
        assert set(d["box3d"]) == {"xyz", "hwl", "ry", "depth_sigma"}
        assert len(d["box3d"]["xyz"]) == 3 and len(d["box3d"]["hwl"]) == 3
    finally:
        srv.stop()
