"""TF SavedModel / TFLite export round-trip (reference exporter.py TF
formats, via jax2tf native serialization)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from yolov10_3d_tpu.engine.exporter import Exporter
from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.ops.postprocess import v10_detections


def test_tf_saved_model_roundtrip(tmp_path):
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml", nc=8)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    ex = Exporter(model, spec, variables)
    p = ex(fmt="tf_saved_model", imgsz=64, max_det=10, out=str(tmp_path / "sm"))
    loaded = tf.saved_model.load(p)
    xi = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    boxes, scores, labels = loaded.f(tf.constant(xi))
    det = v10_detections(
        model.apply(variables, jnp.asarray(xi), train=False)["one2one"],
        spec.strides, spec.nc, max_det=10,
    )
    np.testing.assert_allclose(
        boxes.numpy(), np.asarray(det["boxes"]), rtol=1e-4, atol=1e-4
    )

    with pytest.raises(ValueError, match="unknown export format"):
        ex(fmt="engine")  # TensorRT: genuinely unsupported


def test_autobackend_loads_tf_formats(tmp_path):
    """Exporter formats round-trip through AutoBackend (reference
    autobackend.py suffix dispatch)."""
    from yolov10_3d_tpu.nn.autobackend import AutoBackend

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml", nc=8)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    ex = Exporter(model, spec, variables)
    xi = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    det = v10_detections(
        model.apply(variables, jnp.asarray(xi), train=False)["one2one"],
        spec.strides, spec.nc, max_det=10,
    )

    sm = ex(fmt="tf_saved_model", imgsz=64, max_det=10, out=str(tmp_path / "sm"))
    backend = AutoBackend(sm)
    assert backend.kind == "tf_saved_model"
    assert backend.input_shape == (1, 64, 64, 3)
    boxes, scores, labels = backend.forward(xi)
    np.testing.assert_allclose(boxes, np.asarray(det["boxes"]), rtol=1e-4, atol=1e-4)

    tfl = ex(fmt="tflite", imgsz=64, max_det=10, out=str(tmp_path / "m.tflite"))
    backend = AutoBackend(tfl)
    assert backend.kind == "tflite"
    outs = backend.warmup().forward(xi)
    by_shape = {o.shape[-1] if o.ndim == 3 else "s": o for o in outs}
    np.testing.assert_allclose(
        by_shape[4], np.asarray(det["boxes"]), rtol=1e-3, atol=1e-3
    )


def test_pb_frozen_graph_roundtrip(tmp_path):
    """fmt='pb' writes a variable-free frozen GraphDef + endpoint sidecar;
    AutoBackend re-imports it and matches the jax forward (reference
    exporter.py export_pb / autobackend.py pb branch)."""
    from yolov10_3d_tpu.nn.autobackend import AutoBackend

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml", nc=8)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    ex = Exporter(model, spec, variables)
    p = ex(fmt="pb", imgsz=64, max_det=10, out=str(tmp_path / "m.pb"))
    assert p.endswith(".pb") and (tmp_path / "m.pb.json").exists()

    # the artifact alone (plus sidecar) must reconstruct the function
    backend = AutoBackend(p)
    assert backend.kind == "pb"
    assert backend.input_shape == (1, 64, 64, 3)
    xi = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    boxes, scores, labels = backend.warmup().forward(xi)
    det = v10_detections(
        model.apply(variables, jnp.asarray(xi), train=False)["one2one"],
        spec.strides, spec.nc, max_det=10,
    )
    np.testing.assert_allclose(boxes, np.asarray(det["boxes"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(scores, np.asarray(det["scores"]), rtol=1e-4, atol=1e-4)
