"""Device preprocessing: Pallas HSV kernel vs colorsys reference, fused
letterbox vs the host cv2 implementation."""

import colorsys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_hsv_kernel_matches_colorsys():
    from yolov10_3d_tpu.ops.pallas_preprocess import hsv_jitter

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 8, 128, 3)).astype(np.float32)
    gains = np.array([[1.0, 1.0, 1.0], [0.95, 1.3, 0.8]], np.float32)
    out = np.asarray(hsv_jitter(jnp.asarray(imgs), jnp.asarray(gains), interpret=True))

    # identity gains -> identity image
    np.testing.assert_allclose(out[0], imgs[0], atol=1e-5)

    # jittered image matches per-pixel colorsys math
    for (y, x) in [(0, 0), (3, 50), (7, 127)]:
        r, g, b = imgs[1, y, x]
        h, s, v = colorsys.rgb_to_hsv(r, g, b)
        h = (h * gains[1][0]) % 1.0
        s = min(max(s * gains[1][1], 0.0), 1.0)
        v = min(max(v * gains[1][2], 0.0), 1.0)
        expect = colorsys.hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(out[1, y, x], expect, atol=1e-4)


def test_device_letterbox_matches_host():
    pytest.importorskip("cv2")
    from yolov10_3d_tpu.data.preprocess import letterbox
    from yolov10_3d_tpu.ops.pallas_preprocess import serve_preprocess

    # smooth gradient image: uncorrelated noise amplifies tiny resampling
    # convention differences between cv2 INTER_LINEAR and XLA bilinear
    yy, xx = np.mgrid[0:60, 0:100]
    img = np.stack([yy * 2, xx * 2, (yy + xx)], -1).astype(np.uint8)
    host, r, (dw, dh) = letterbox(img, (64, 64))
    dev = np.asarray(serve_preprocess(jnp.asarray(img[None]), (64, 64)))[0]
    # same geometry: padding rows/cols match exactly; resampled interior within
    # a tolerance (cv2 INTER_LINEAR vs XLA bilinear differ in rounding)
    host_f = host.astype(np.float32) / 255.0
    assert dev.shape == host_f.shape
    # padded border exact
    np.testing.assert_allclose(dev[:12], host_f[:12], atol=1e-6)
    # interior close
    diff = np.abs(dev - host_f).mean()
    assert diff < 0.02, diff


def test_device_flip():
    from yolov10_3d_tpu.ops.pallas_preprocess import device_flip_lr

    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    out = device_flip_lr(x, jnp.array([True, False]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0])[:, ::-1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1]))
