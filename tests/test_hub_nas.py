"""Local hub registry + NAS facade gates."""

import numpy as np
import pytest

from yolov10_3d_tpu.hub import LocalHub, login, logout
from yolov10_3d_tpu.models.nas import NAS


def test_local_hub_roundtrip(tmp_path):
    hub = LocalHub(tmp_path / "hub")
    w = tmp_path / "w.ckpt"
    w.write_bytes(b"fake-weights")
    p = hub.upload_model("run1", str(w), epoch=3)
    assert "epoch3.ckpt" in p
    hub.upload_model("run1", str(w), is_best=True)
    hub.upload_metrics("run1", {"mAP": 0.5}, epoch=3)
    assert hub.list_models() == ["run1"]
    assert hub.get_metrics("run1")[0]["mAP"] == 0.5
    assert hub.pull("run1").endswith("best.ckpt")
    with pytest.raises(FileNotFoundError):
        hub.pull("run2")


def test_login_gated():
    with pytest.raises(RuntimeError, match="network"):
        login()
    logout()  # no-op


def test_nas_gate_and_postprocess():
    with pytest.raises(RuntimeError, match="super-gradients"):
        NAS("yolo_nas_s.pt")
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([[0.9, 0.1], [0.8, 0.1], [0.1, 0.7]], np.float32)
    b, s, c = NAS.postprocess_raw(boxes, scores, iou=0.5, conf=0.2)
    assert len(b) == 2  # overlapping pair suppressed to one
    assert set(c.tolist()) == {0, 1}
