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


class _EndToEndDet(torch.nn.Module):
    """Stand-in for a reference end-to-end export: one (B, max_det, 6)
    [x1,y1,x2,y2,conf,cls] tensor out (v10 postprocessed head)."""

    def forward(self, x):
        b = x.shape[0]
        base = x.mean(dim=(1, 2, 3), keepdim=True).reshape(b, 1, 1)
        det = torch.arange(300 * 6, dtype=torch.float32).reshape(1, 300, 6)
        return det.repeat(b, 1, 1) + base


def test_torchscript_end_to_end_decodes_to_contract(tmp_path):
    """A single (B, max_det, 6) output is split into the unified
    (boxes, scores, labels) forward() contract (ADVICE r3 medium)."""
    mod = _EndToEndDet().eval()
    ts = torch.jit.trace(mod, torch.zeros(2, 3, 32, 32))
    path = tmp_path / "e2e.torchscript"
    # half-precision artifact: backend must pin the module back to fp32
    torch.jit.save(torch.jit.trace(mod, torch.zeros(2, 3, 32, 32)), str(path),
                   _extra_files={"config.txt": json.dumps(
                       {"names": ["car", "person"], "imgsz": [32, 32], "batch": 2})})
    backend = AutoBackend(path)
    # list-valued names (older reference exports) load via enumerate
    assert backend.names == {0: "car", 1: "person"}
    x = np.random.default_rng(1).uniform(size=(2, 32, 32, 3)).astype(np.float32)
    boxes, scores, labels = backend.forward(x)
    assert boxes.shape == (2, 300, 4)
    assert scores.shape == (2, 300)
    assert labels.shape == (2, 300) and labels.dtype == np.int32
    with torch.no_grad():
        want = mod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(boxes, want[..., :4], rtol=1e-6)
    np.testing.assert_allclose(scores, want[..., 4], rtol=1e-6)
    np.testing.assert_array_equal(labels, want[..., 5].astype(np.int32))


def test_torchscript_no_metadata_warmup(tmp_path):
    _, path = _export(tmp_path, with_meta=False)
    backend = AutoBackend(path)
    assert backend.names == {} and backend.nc is None
    assert backend.input_shape is None
    out = backend.warmup(imgsz=(1, 32, 32, 3))  # falls back to caller imgsz
    assert out is backend
