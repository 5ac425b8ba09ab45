"""Modulated deformable conv (DCNv2): identity + brute-force parity.

torchvision's CUDA/C++ deform_conv2d is not installed offline, so the oracle
is (a) the exact zero-offset identity (DCNv2 with zero offsets and unit
modulation IS the regular conv) and (b) a direct numpy transliteration of
the DCNv2 definition.
"""

import numpy as np
import jax
import jax.numpy as jnp

from yolov10_3d_tpu.ops.deform import deform_conv2d


def _numpy_dcn(x, offset, mask, weight, stride, pad):
    """Brute-force DCNv2 (NHWC, zero border)."""
    B, H, W, C = x.shape
    kh, kw, _, O = weight.shape
    _, Ho, Wo, _ = offset.shape
    out = np.zeros((B, Ho, Wo, O), np.float64)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                acc = np.zeros(O)
                for ky in range(kh):
                    for kx in range(kw):
                        k = ky * kw + kx
                        y = i * stride - pad + ky + offset[b, i, j, 2 * k]
                        xx = j * stride - pad + kx + offset[b, i, j, 2 * k + 1]
                        y0, x0 = int(np.floor(y)), int(np.floor(xx))
                        wy, wx = y - y0, xx - x0
                        v = np.zeros(C)
                        for dy, dx, w in (
                            (0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                            (1, 0, wy * (1 - wx)), (1, 1, wy * wx),
                        ):
                            yy, xc = y0 + dy, x0 + dx
                            if 0 <= yy < H and 0 <= xc < W:
                                v = v + w * x[b, yy, xc]
                        acc += mask[b, i, j, k] * (v @ weight[ky, kx])
                out[b, i, j] = acc
    return out


def test_zero_offset_is_regular_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 11, 6)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 4)), jnp.float32)
    for stride, pad in ((1, 1), (2, 1)):
        Ho = (9 + 2 * pad - 3) // stride + 1
        Wo = (11 + 2 * pad - 3) // stride + 1
        off = jnp.zeros((2, Ho, Wo, 18))
        m = jnp.ones((2, Ho, Wo, 9))
        got = deform_conv2d(x, off, m, w, stride=(stride, stride), padding=(pad, pad))
        want = jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_random_offsets_vs_bruteforce():
    rng = np.random.default_rng(1)
    B, H, W, C, O = 1, 6, 7, 3, 2
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w = rng.normal(size=(3, 3, C, O)).astype(np.float32)
    off = (rng.normal(size=(B, H, W, 18)) * 1.5).astype(np.float32)
    m = rng.uniform(0, 2, (B, H, W, 9)).astype(np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(m), jnp.asarray(w)))
    want = _numpy_dcn(x, off, m, w, stride=1, pad=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_head_builds_and_runs():
    """yolov10n_3D with deform: True — forward runs; at init the zero-init
    offset/modulator make each deform conv numerically a plain conv."""
    import yaml

    from yolov10_3d_tpu.nn.build import build_model

    with open("yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml") as f:
        d = yaml.safe_load(f)
    d["deform"] = True
    d["scale"] = "n"
    model, spec = build_model(d, nc=3)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    # offset/modulator params exist with the torch-parity names
    flat = {"/".join(map(str, [k.key for k in p])): v
            for p, v in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    assert any("offset_conv" in k for k in flat)
    assert any("regular_conv" in k for k in flat)
    out = jax.jit(lambda v: model.apply(v, x, train=False))(variables)
    assert "one2one" in out
