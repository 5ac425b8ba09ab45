"""AutoBackend .torchscript branch: load a traced torch module the way the
reference loads its first-listed export format (autobackend.py:169-173 —
torch.jit.load with a ``config.txt`` metadata extra-file), bridge NHWC->NCHW,
and match eager-torch outputs."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yolov10_3d_tpu.nn.autobackend import AutoBackend


class _TinyDet(torch.nn.Module):
    """Stand-in for a reference-exported detector: NCHW image in, a
    (boxes, scores)-shaped tuple out."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)

    def forward(self, x):
        y = self.conv(x)
        pooled = y.mean(dim=(2, 3))  # (N, 8)
        boxes = pooled[:, :4]
        scores = pooled[:, 4:]
        return boxes, scores


def _export(tmp_path, with_meta):
    torch.manual_seed(0)
    mod = _TinyDet().eval()
    ts = torch.jit.trace(mod, torch.zeros(1, 3, 32, 32))
    path = tmp_path / "tiny.torchscript"
    extra = {}
    if with_meta:
        extra["config.txt"] = json.dumps(
            {"names": {0: "car", 1: "person"}, "imgsz": [32, 32], "batch": 1}
        )
    torch.jit.save(ts, str(path), _extra_files=extra)
    return mod, str(path)


def test_torchscript_roundtrip_matches_eager(tmp_path):
    mod, path = _export(tmp_path, with_meta=True)
    backend = AutoBackend(path)
    assert backend.kind == "torchscript"
    assert backend.names == {0: "car", 1: "person"}
    assert backend.nc == 2
    assert backend.input_shape == (1, 32, 32, 3)

    rng = np.random.default_rng(0)
    x_nhwc = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    boxes, scores = backend.forward(x_nhwc)
    with torch.no_grad():
        want_b, want_s = mod(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(boxes, want_b.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(scores, want_s.numpy(), rtol=1e-5, atol=1e-6)


def test_torchscript_no_metadata_warmup(tmp_path):
    _, path = _export(tmp_path, with_meta=False)
    backend = AutoBackend(path)
    assert backend.names == {} and backend.nc is None
    assert backend.input_shape is None
    out = backend.warmup(imgsz=(1, 32, 32, 3))  # falls back to caller imgsz
    assert out is backend
