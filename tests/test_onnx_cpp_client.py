"""C++ ONNX client parity tests.

The reference ships C++ deployment examples (reference:
examples/YOLOv8-CPP-Inference/inference.cpp,
examples/YOLOv8-ONNXRuntime-CPP/src/inference.cpp). Our counterpart is
``examples/cpp-onnx-inference/onnx_infer.cc`` — a zero-dependency
wire-parser + interpreter for the op subset nn/onnx_export.py emits.
These tests compile it with g++ and assert its outputs match the in-repo
numpy runtime / the jitted JAX forward on exported mini-models.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.onnx_export import export_onnx
from yolov10_3d_tpu.nn.onnx_runtime import OnnxRuntime

from test_onnx_export import MINI_DETECT, MINI_V10, _assert_dets_legit, _build, _rand_img

CC = Path(__file__).resolve().parent.parent / "examples" / "cpp-onnx-inference" / "onnx_infer.cc"

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


@pytest.fixture(scope="session")
def client(tmp_path_factory):
    exe = tmp_path_factory.mktemp("cpp") / "onnx_infer"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-fopenmp", str(CC), "-o", str(exe)],
        check=True, capture_output=True, text=True,
    )
    return exe


def _run_client(exe, model_path, inputs, workdir):
    """Feed .npy inputs, return list of output arrays (graph output order)."""
    in_paths = []
    for i, arr in enumerate(inputs):
        p = workdir / f"in{i}.npy"
        np.save(p, arr)
        in_paths.append(str(p))
    prefix = str(workdir / "cpp_")
    r = subprocess.run(
        [str(exe), str(model_path), *in_paths, "--out", prefix],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    rt = OnnxRuntime(Path(model_path).read_bytes())
    return [np.load(f"{prefix}{name}.npy") for name in rt.output_names]


def test_primitive_soup_parity(client, tmp_path):
    """Elementwise/reduce/gather/topk/einsum ops vs the numpy runtime."""

    def f(x):
        y = jnp.maximum(x, 0.0) * 2.0 + jnp.arange(12.0).reshape(3, 4)
        z = jax.nn.sigmoid(y)
        s = jax.nn.softmax(y, axis=-1)
        v, i = jax.lax.top_k(z.reshape(-1), 5)
        m = jnp.einsum("ij,kj->ik", z, z)
        red = y.sum(axis=0) + y.max(axis=1).min() + jnp.abs(y).prod(axis=0)
        am = jnp.argmax(z, axis=1)
        sl = y[::, 1:3]
        w = jnp.where(y > 1.0, y, -y)
        c = jnp.clip(y, 0.5, 2.0)
        r = jnp.sqrt(jnp.abs(y)) + jax.lax.rsqrt(jnp.abs(y) + 1.0)
        md = jnp.remainder(jnp.asarray([7, -7]), jnp.asarray([3, 3]))
        cs = jax.lax.cumsum(y, axis=1, reverse=True) + jnp.cumsum(y, axis=0)
        fl = jnp.flip(y, axis=0)
        return z, s, v, i, m, red, am, sl, w, c, r, md, cs, fl

    x = jnp.asarray(np.random.RandomState(0).randn(3, 4).astype(np.float32))
    blob = export_onnx(f, [x], input_names=["x"], nchw_input=False)
    path = tmp_path / "soup.onnx"
    path.write_bytes(blob)
    ref = OnnxRuntime(blob)(np.asarray(x))
    outs = _run_client(client, path, [np.asarray(x)], tmp_path)
    assert len(outs) == len(ref)
    for o, r in zip(outs, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(
            np.asarray(o, np.float64), np.asarray(r, np.float64),
            rtol=1e-5, atol=1e-6,
        )


def test_mini_detect_raw_parity(client, tmp_path):
    """Full conv backbone + raw Detect decode: exact numeric parity."""
    from yolov10_3d_tpu.engine.exporter import Exporter
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    model, spec, variables, _ = _build(MINI_DETECT)
    Exporter(model, spec, variables)(
        "onnx", imgsz=64, out=str(tmp_path / "det.onnx")
    )
    img = _rand_img((64, 64), seed=3)
    (preds,) = _run_client(client, tmp_path / "det.onnx",
                           [np.transpose(img, (0, 3, 1, 2))], tmp_path)
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(img), train=False)
        feats = out["det"] if isinstance(out, dict) else out
        ref = np.asarray(decode_detect(feats, spec.strides, spec.nc))
    assert preds.shape == ref.shape
    np.testing.assert_allclose(preds, ref, rtol=1e-3, atol=1e-3)


def test_mini_v10_end2end(client, tmp_path):
    """v10 top-k epilogue: score multiset + row legitimacy (ties permute)."""
    from yolov10_3d_tpu.engine.exporter import Exporter
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    model, spec, variables, _ = _build(MINI_V10)
    Exporter(model, spec, variables)(
        "onnx", imgsz=64, max_det=20, out=str(tmp_path / "mini.onnx")
    )
    img = _rand_img((64, 64))
    boxes, scores, labels = _run_client(
        client, tmp_path / "mini.onnx", [np.transpose(img, (0, 3, 1, 2))], tmp_path
    )
    assert boxes.shape == (1, 20, 4) and scores.shape == (1, 20)
    with jax.default_matmul_precision("highest"):
        feats = model.apply(variables, jnp.asarray(img), train=False)["one2one"]
        dense = np.asarray(decode_detect(feats, spec.strides, spec.nc))[0]
    _assert_dets_legit(boxes[0], scores[0], labels[0], dense, k=20)


def test_ppm_image_mode(client, tmp_path):
    """P6 .ppm in -> letterbox -> detections printed, exit 0."""
    from yolov10_3d_tpu.engine.exporter import Exporter

    model, spec, variables, _ = _build(MINI_V10)
    Exporter(model, spec, variables)(
        "onnx", imgsz=64, max_det=10, out=str(tmp_path / "mini.onnx")
    )
    rng = np.random.RandomState(7)
    w, h = 96, 48  # non-square: exercises the letterbox pad path
    rgb = rng.randint(0, 256, (h, w, 3), np.uint8)
    ppm = tmp_path / "img.ppm"
    with open(ppm, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes())
    r = subprocess.run(
        [str(client), str(tmp_path / "mini.onnx"), str(ppm), "--conf", "0.0"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    dets = [l for l in r.stdout.splitlines() if l.startswith("det ")]
    assert len(dets) == 10  # conf 0.0 -> all max_det rows print
    # boxes must land inside the source image after unletterboxing
    for line in dets:
        coords = [float(v) for v in line.split("box=[")[1].rstrip("]").split(",")]
        x1, y1, x2, y2 = coords
        assert -1e-6 <= x1 <= w + 1e-6 and -1e-6 <= y1 <= h + 1e-6
        assert x2 <= w + 1e-6 and y2 <= h + 1e-6
