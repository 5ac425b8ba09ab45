"""Correctness of the round-5 Pallas candidate kernels vs their XLA twins
(interpret mode on CPU; tools/exp_pallas_campaign.py times the compiled
kernels on the real chip)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _silu(x):
    return x * (1.0 / (1.0 + np.exp(-x)))


def test_decode_pallas_matches_xla():
    from yolov10_3d_tpu.ops.boxes import make_anchors
    from yolov10_3d_tpu.ops.pallas_kernels import decode_detect_pallas
    from yolov10_3d_tpu.ops.postprocess import decode_detect

    nc, reg_max = 80, 16
    shapes = [(8, 8), (4, 4), (2, 2)]
    strides = (8, 16, 32)
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(0, 1, (2, h, w, 4 * reg_max + nc)).astype(np.float32))
        for h, w in shapes
    ]
    ref = np.asarray(decode_detect(feats, strides, nc))

    flat = jnp.concatenate([f.reshape(2, -1, f.shape[-1]) for f in feats], 1)
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    boxes, scores = decode_detect_pallas(
        flat, anchors, stride_t, nc, block_a=28, interpret=True
    )
    np.testing.assert_allclose(np.asarray(boxes), ref[..., :4], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), ref[..., 4:], rtol=1e-5, atol=1e-6)


def test_int8_mm_fused_matches_reference_math():
    from yolov10_3d_tpu.ops.pallas_kernels import int8_mm_fused

    rng = np.random.default_rng(1)
    M, K, N = 64, 32, 48
    xq = rng.integers(-127, 128, (M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, (K, N)).astype(np.int8)
    scale = rng.uniform(1e-4, 2e-4, N).astype(np.float32)
    bias = rng.uniform(-0.1, 0.1, N).astype(np.float32)
    inv = np.float32(17.0)

    got = np.asarray(
        int8_mm_fused(
            jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(scale),
            jnp.asarray(bias), jnp.asarray(inv), block_m=32, block_n=16,
            interpret=True,
        )
    )
    acc = xq.astype(np.int32) @ wq.astype(np.int32)
    f = _silu(acc.astype(np.float32) * scale + bias)
    want = np.clip(np.round(f * inv), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


def test_int8_conv3x3_fused_matches_reference_math():
    from yolov10_3d_tpu.ops.pallas_kernels import int8_conv3x3_fused

    rng = np.random.default_rng(2)
    B, H, W, K, N = 2, 8, 10, 16, 24
    xq = rng.integers(-80, 81, (B, H, W, K)).astype(np.int8)
    wq = rng.integers(-80, 81, (3, 3, K, N)).astype(np.int8)
    scale = rng.uniform(1e-4, 2e-4, N).astype(np.float32)
    bias = rng.uniform(-0.1, 0.1, N).astype(np.float32)
    inv = np.float32(11.0)

    got = np.asarray(
        int8_conv3x3_fused(
            jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(scale),
            jnp.asarray(bias), jnp.asarray(inv), block_n=8, interpret=True,
        )
    )
    # XLA twin: SAME conv in int32, then the same epilogue
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.int32), jnp.asarray(wq, jnp.int32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    f = _silu(np.asarray(acc, np.float32) * scale + bias)
    want = np.clip(np.round(f * inv), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)
