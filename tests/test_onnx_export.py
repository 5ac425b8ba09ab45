"""ONNX export round-trip tests.

The reference exports .onnx via torch.onnx (reference exporter.py:353) and
loads it back through onnxruntime (autobackend.py). Neither package exists
offline, so the repo ships its own wire-format writer (nn/onnx_wire.py),
jaxpr translator (nn/onnx_export.py) and numpy evaluator
(nn/onnx_runtime.py); these tests close the loop by running the exported
graph against the jitted JAX forward.

Top-k caveat: an untrained net is spatially near-uniform, so anchor scores
effectively tie and 1e-7 noise flips rankings between backends. Epilogue
tests therefore assert (a) the sorted score multiset matches and (b) every
emitted (box, label, score) row is a legitimate (anchor, class) pair of the
dense reference decode — not index-exact equality.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn import onnx_wire as W
from yolov10_3d_tpu.nn.onnx_export import export_onnx
from yolov10_3d_tpu.nn.onnx_runtime import OnnxRuntime

MINI_V10 = {
    "nc": 8,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C2f", [32, 1, True]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "SPPF", [64, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [64, 3, 2]],
        [[4, 5], 1, "v10Detect", ["nc"]],
    ],
}

MINI_DETECT = {**MINI_V10, "head": [
    [-1, 1, "Conv", [64, 3, 2]],
    [[4, 5], 1, "Detect", ["nc"]],
]}

MINI_CLS = {
    "nc": 5,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C2f", [32, 1, True]],
    ],
    "head": [[-1, 1, "Classify", ["nc"]]],
}


def _build(cfg, hw=(64, 64), fast_eval=True, seed=0):
    from yolov10_3d_tpu.nn.build import build_model

    model, spec = build_model(cfg, fast_eval=fast_eval)
    x = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    return model, spec, variables, x


def _rand_img(hw, seed=0):
    return np.random.RandomState(seed).rand(1, hw[0], hw[1], 3).astype(np.float32)


# ---------------------------------------------------------------------------


def test_wire_roundtrip():
    t = W.Tensor("w", np.arange(6, dtype=np.float32).reshape(2, 3))
    node = W.Node(
        op_type="Conv", inputs=["x", "w"], outputs=["y"], name="n0",
        attributes={"strides": [2, 2], "alpha": 0.5, "mode": "constant",
                    "group": 1},
    )
    graph = W.Graph(
        name="g", nodes=[node],
        inputs=[W.ValueInfo("x", W.FLOAT, (1, 3, "H", 8))],
        outputs=[W.ValueInfo("y", W.INT64, (1, 4))],
        initializers=[t, W.Tensor("i", np.array([3, -7], np.int64))],
    )
    m = W.Model(graph=graph, opset=13, metadata={"nc": "80"})
    m2 = W.decode_model(m.encode())
    assert m2.opset == 13
    assert m2.metadata == {"nc": "80"}
    g2 = m2.graph
    assert g2.name == "g"
    n2 = g2.nodes[0]
    assert n2.op_type == "Conv" and n2.inputs == ["x", "w"]
    assert n2.attributes["strides"] == [2, 2]
    assert n2.attributes["alpha"] == pytest.approx(0.5)
    assert n2.attributes["mode"] == "constant"
    assert n2.attributes["group"] == 1
    np.testing.assert_array_equal(g2.initializers[0].array, t.array)
    np.testing.assert_array_equal(g2.initializers[1].array, [3, -7])
    assert g2.inputs[0].shape == (1, 3, "H", 8)
    assert g2.outputs[0].elem_type == W.INT64


def test_primitive_roundtrip():
    def f(x):
        y = jnp.maximum(x, 0.0) * 2.0 + jnp.arange(12.0).reshape(3, 4)
        z = jax.nn.sigmoid(y)
        s = jax.nn.softmax(y, axis=-1)
        v, i = jax.lax.top_k(z.reshape(-1), 5)
        taken = jnp.take_along_axis(z, jnp.argsort(-z, axis=1)[:, :2], axis=1)
        parts = jnp.split(y, 2, axis=1)
        cat = jnp.concatenate(parts[::-1], axis=1)
        m = jnp.einsum("ij,kj->ik", z, z)
        red = y.sum(axis=0) + y.max(axis=1).min() + jnp.abs(y).prod(axis=0)
        am = jnp.argmax(z, axis=1)
        sl = y[::, 1:3]
        w = jnp.where(y > 1.0, y, -y)
        c = jnp.clip(y, 0.5, 2.0)
        r = jnp.sqrt(jnp.abs(y)) + jax.lax.rsqrt(jnp.abs(y) + 1.0)
        md = jnp.remainder(jnp.asarray([7, -7]), jnp.asarray([3, 3]))
        fl = jnp.flip(y, axis=0) + jnp.flip(y, axis=1)
        cs = jax.lax.cumsum(y, axis=1, reverse=True) + jnp.cumsum(y, axis=0)
        fin = jnp.isfinite(y / jnp.where(y > 1.0, 0.0, 1.0))
        anyall = jnp.any(y > 1.0, axis=1) & jnp.all(y > -100.0, axis=0)[0]
        rm = jax.checkpoint(lambda t: jnp.sin(t) * 2.0)(y)
        return z, s, v, i, taken, cat, m, red, am, sl, w, c, r, md, fl, cs, fin, anyall, rm

    x = jnp.asarray(np.random.RandomState(0).randn(3, 4).astype(np.float32))
    blob = export_onnx(f, [x], input_names=["x"], nchw_input=False)
    rt = OnnxRuntime(blob)
    outs = rt(np.asarray(x))
    with jax.default_matmul_precision("highest"):
        refs = [np.asarray(o) for o in f(x)]
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        assert o.shape == r.shape
        np.testing.assert_allclose(
            np.asarray(o, np.float64), np.asarray(r, np.float64),
            rtol=1e-5, atol=1e-6,
        )


def _assert_dets_legit(boxes, scores, labels, dense, k, sigmoid_scores=False):
    """Every emitted row must be a legitimate (anchor, class) pair of the
    dense decode and the sorted score multiset must match the true top-k."""
    cls = dense[:, 4:] if not sigmoid_scores else 1.0 / (1.0 + np.exp(-dense[:, :3]))
    flat = np.sort(cls.reshape(-1))[::-1][:k]
    np.testing.assert_allclose(
        np.sort(scores)[::-1], flat, rtol=1e-4, atol=1e-5
    )
    for b, s, l in zip(boxes, scores, labels):
        d = np.abs(dense[:, :4] - b).max(axis=1)
        i = int(d.argmin())
        assert d[i] < 1e-2, f"box {b} not in dense decode (min diff {d[i]})"
        assert abs(cls[i, l] - s) < 1e-3


def test_mini_v10_end2end(tmp_path):
    from yolov10_3d_tpu.engine.exporter import Exporter
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    model, spec, variables, x = _build(MINI_V10)
    path = Exporter(model, spec, variables)(
        "onnx", imgsz=64, max_det=20, out=str(tmp_path / "mini.onnx")
    )
    rt = OnnxRuntime((tmp_path / "mini.onnx").read_bytes())
    assert rt.model.metadata["nc"] == "8"
    assert json.loads(rt.model.metadata["strides"]) == list(spec.strides)

    img = _rand_img((64, 64))
    boxes, scores, labels = rt(np.transpose(img, (0, 3, 1, 2)))
    assert boxes.shape == (1, 20, 4) and scores.shape == (1, 20)
    with jax.default_matmul_precision("highest"):
        feats = model.apply(variables, jnp.asarray(img), train=False)["one2one"]
        dense = np.asarray(decode_detect(feats, spec.strides, spec.nc))[0]
    _assert_dets_legit(boxes[0], scores[0], labels[0], dense, k=20)


def test_mini_detect_raw_parity(tmp_path):
    from yolov10_3d_tpu.engine.exporter import Exporter
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    model, spec, variables, x = _build(MINI_DETECT)
    path = Exporter(model, spec, variables)(
        "onnx", imgsz=64, out=str(tmp_path / "det.onnx")
    )
    rt = OnnxRuntime((tmp_path / "det.onnx").read_bytes())
    assert rt.model.metadata.get("nms") == "consumer"
    img = _rand_img((64, 64), seed=3)
    (preds,) = rt(np.transpose(img, (0, 3, 1, 2)))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(img), train=False)
        feats = out["det"] if isinstance(out, dict) else out
        ref = np.asarray(decode_detect(feats, spec.strides, spec.nc))
    assert preds.shape == ref.shape
    np.testing.assert_allclose(preds, ref, rtol=1e-3, atol=1e-3)


def test_mini_classify_parity(tmp_path):
    from yolov10_3d_tpu.engine.exporter import Exporter

    model, spec, variables, x = _build(MINI_CLS)
    path = Exporter(model, spec, variables)(
        "onnx", imgsz=64, out=str(tmp_path / "cls.onnx")
    )
    rt = OnnxRuntime((tmp_path / "cls.onnx").read_bytes())
    img = _rand_img((64, 64), seed=5)
    (probs,) = rt(np.transpose(img, (0, 3, 1, 2)))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(
            jax.nn.softmax(model.apply(variables, jnp.asarray(img), train=False), -1)
        )
    assert probs.shape == ref.shape
    np.testing.assert_allclose(probs, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_autobackend_onnx(tmp_path):
    from yolov10_3d_tpu.engine.exporter import Exporter
    from yolov10_3d_tpu.nn.autobackend import AutoBackend

    model, spec, variables, x = _build(MINI_V10)
    path = Exporter(model, spec, variables)(
        "onnx", imgsz=64, max_det=10, out=str(tmp_path / "ab.onnx")
    )
    backend = AutoBackend(path)
    assert backend.kind == "onnx"
    assert backend.nc == 8
    assert backend.max_det == 10
    assert backend.input_shape == (1, 64, 64, 3)
    backend.warmup()
    boxes, scores, labels = backend.forward(_rand_img((64, 64)))
    assert boxes.shape == (1, 10, 4)
    assert scores.shape == (1, 10)
    assert labels.dtype in (np.int32, np.int64)


def test_yolov10n_dense_parity():
    """Full real-model coverage: every v10 block type through the
    translator, dense (pre-top-k) decode parity against JAX."""
    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml", scale="n", fast_eval=True
    )
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def dense(x):
        feats = model.apply(variables, x, train=False)["one2one"]
        return decode_detect(feats, spec.strides, spec.nc)

    blob = export_onnx(dense, [x], input_names=["images"],
                       output_names=["predictions"])
    rt = OnnxRuntime(blob)
    img = _rand_img((96, 96), seed=7)
    (preds,) = rt(np.transpose(img, (0, 3, 1, 2)))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(dense(jnp.asarray(img)))
    assert preds.shape == ref.shape
    np.testing.assert_allclose(preds, ref, rtol=2e-3, atol=2e-3)


def test_yolov10_3d_end2end(tmp_path):
    """3D head: 16-branch v10Detect3d through the translator with the full
    NMS-free epilogue (reg/scores/labels)."""
    from yolov10_3d_tpu.engine.exporter import Exporter
    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.ops.postprocess import decode_detect3d

    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml", scale="n",
        fast_eval=True,
    )
    x = jnp.zeros((1, 96, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    path = Exporter(model, spec, variables)(
        "onnx", imgsz=(160, 96), max_det=15, out=str(tmp_path / "m3d.onnx")
    )
    rt = OnnxRuntime((tmp_path / "m3d.onnx").read_bytes())
    img = _rand_img((96, 160), seed=9)
    reg, scores, labels = rt(np.transpose(img, (0, 3, 1, 2)))
    assert reg.shape == (1, 15, 35)
    with jax.default_matmul_precision("highest"):
        feats = model.apply(variables, jnp.asarray(img), train=False)["one2one"]
        dense = np.asarray(
            decode_detect3d(feats, spec.strides[: len(feats)], spec.nc)
        )[0]
    # scores are sigmoided top-k of the raw cls logits
    cls = 1.0 / (1.0 + np.exp(-dense[:, : spec.nc]))
    flat = np.sort(cls.reshape(-1))[::-1][:15]
    np.testing.assert_allclose(np.sort(scores[0])[::-1], flat,
                               rtol=1e-4, atol=1e-5)
    # every reg row must be a legitimate anchor row of the dense decode
    for r in reg[0]:
        d = np.abs(dense[:, spec.nc:] - r).max(axis=1)
        assert d.min() < 1e-2
