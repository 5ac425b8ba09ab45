"""v8-family inference epilogues: NMS detections, keypoint decode, OBB angle,
mask processing, probiou."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.ops.boxes import probiou
from yolov10_3d_tpu.ops.postprocess import (
    decode_kpts, decode_obb_angle, process_masks, v8_detections,
)

from _helpers import apply_model, build_jax


def test_v8_detections_end_to_end():
    import functools

    from yolov10_3d_tpu.nn.build import build_model

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v8/yolov8.yaml", scale="n")
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(model.init, static_argnames="train")(jax.random.PRNGKey(0), x, train=False)
    feats = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    det = jax.jit(
        functools.partial(v8_detections, strides=spec.strides, nc=spec.nc, max_det=20)
    )(feats)
    assert det["boxes"].shape == (1, 20, 4)
    assert det["valid"].dtype == bool


def test_decode_kpts_shapes_and_scaling():
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((2, 8, 8, 51)).astype(np.float32))]
    out = decode_kpts(feats, [8], (17, 3))
    assert out.shape == (2, 64, 51)
    # zero raw xy at anchor (0.5, 0.5) decodes to (0.5-0.5)*... = anchor-based px
    z = decode_kpts([jnp.zeros((1, 2, 2, 51))], [8], (17, 3))
    kx = np.asarray(z)[0, 0].reshape(17, 3)
    np.testing.assert_allclose(kx[:, 0], 0.0, atol=1e-6)  # (0*2 + 0.5-0.5)*8
    np.testing.assert_allclose(kx[:, 2], 0.5, atol=1e-6)  # sigmoid(0)


def test_obb_angle_range():
    feats = [jnp.asarray(np.linspace(-10, 10, 32, dtype=np.float32).reshape(1, 4, 8, 1))]
    ang = np.asarray(decode_obb_angle(feats))
    assert ang.min() >= -math.pi / 4 - 1e-5
    assert ang.max() <= 3 * math.pi / 4 + 1e-5


def test_process_masks_crop():
    protos = jnp.ones((1, 16, 16, 4))
    coefs = jnp.ones((1, 2, 4)) * 2.0
    boxes = jnp.asarray([[[0, 0, 32, 32], [32, 32, 64, 64]]], dtype=jnp.float32)
    masks = np.asarray(process_masks(protos, coefs, boxes, (64, 64)))
    assert masks.shape == (1, 2, 16, 16)
    # det 0 box covers top-left quadrant only
    assert masks[0, 0, :8, :8].min() > 0.9
    assert masks[0, 0, 8:, 8:].max() == 0.0
    # det 1 covers bottom-right
    assert masks[0, 1, 8:, 8:].min() > 0.9
    assert masks[0, 1, :8, :8].max() == 0.0


def test_probiou_parity():
    import torch

    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.metrics import probiou as ref_probiou

    rng = np.random.default_rng(2)
    a = np.concatenate(
        [rng.uniform(0, 100, (32, 2)), rng.uniform(5, 40, (32, 2)),
         rng.uniform(-math.pi / 4, 3 * math.pi / 4, (32, 1))], -1,
    ).astype(np.float32)
    b = (a + rng.normal(0, 3, a.shape) * [1, 1, 0.5, 0.5, 0.1]).astype(np.float32)
    b[:, 2:4] = np.abs(b[:, 2:4]) + 2
    ref = ref_probiou(torch.from_numpy(a), torch.from_numpy(b)).numpy().ravel()
    ours = np.asarray(probiou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)
