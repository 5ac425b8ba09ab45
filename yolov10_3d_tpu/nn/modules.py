"""Neural-net building blocks for the TPU-native YOLOv10(-3D) framework.

All modules are flax.linen, operate in NHWC layout (TPU-native; the reference
is NCHW torch, cf. /root/reference/ultralytics/nn/modules/{conv,block}.py), and
are written so that parameter trees map 1:1 onto the reference state_dict names
(list attributes auto-name children ``attr_i`` which matches torch's ``attr.i``
after dot->underscore normalisation; see utils/torch_convert.py).

Numerical conventions matching the reference:
  - activation: SiLU (conv.py:107 ``default_act = nn.SiLU()``)
  - BatchNorm: eps=1e-3, momentum=0.03 torch-style (torch_utils.py:327
    ``initialize_weights``) -> flax momentum = 0.97
  - "same" autopad p = k // 2 (conv.py:28 ``autopad``)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-3
BN_MOMENTUM = 0.97  # flax keep-fraction == 1 - torch momentum (0.03)

# Serving-mode int8 quantization (trace-time static). The v5e MXU runs int8
# at ~2x bf16 throughput (measured 284 TOPS vs 120 TFLOPS on this chip);
# enabling this quantizes every Conv's matmul path: activations per-tensor
# (dynamic max-abs), weights per-output-channel, accumulate int32, dequant
# before BN+act. Opt-in because it is a numerics-changing PTQ transform.
_INT8_MODE = False
# activations after SiLU on a BN-normalized net are tightly bounded; a fixed
# default scale covers them (calibrate per-deployment via calibrate_scale)
_INT8_ACT_SCALE: object = None  # None = dynamic max-abs (slow); float = static
_INT8_SCOPE = "k3"  # "k3" = only measured-winning k>=3 dense convs; "all"


def set_int8_mode(enabled: bool, act_scale=8.0 / 127.0, scope: str = "k3") -> None:
    """Enable int8 quantized convolutions for subsequently TRACED functions
    (a trace-time static switch: call before jit tracing, not inside).
    act_scale: static per-tensor activation scale (default assumes |x|<=8,
    ample for SiLU outputs on BN-normalized nets); None falls back to
    dynamic max-abs quantization (slower: unfusable full reductions).
    scope: "k3" (default) quantizes only k>=3 dense convs — the shapes where
    int8 measures FASTER than bf16 on v5e (1.28-1.81x; 1x1 convs measure
    0.6-0.75x and stay bf16). "k3deep" additionally quantizes 1x1 dense
    convs on small feature maps (H*W <= _INT8_DEEP_HW): the round-5 B=128
    chained campaign (tools/exp_pallas_campaign.py) measured the XLA int8
    flow at 3.2x bf16 on the 20x20x512 1x1 shape (0.171 vs 0.549 ms/layer)
    while 80x80/40x40 1x1s still lose — so the whole deep stage runs int8
    end to end with no intermediate dequant. "all" quantizes every Conv."""
    global _INT8_MODE, _INT8_ACT_SCALE, _INT8_SCOPE
    _INT8_MODE = bool(enabled)
    _INT8_ACT_SCALE = act_scale
    if scope not in ("k3", "k3deep", "all"):
        raise ValueError(f"scope must be 'k3', 'k3deep' or 'all', got {scope!r}")
    _INT8_SCOPE = scope


# "k3deep": 1x1 convs quantize when H*W <= this. 512 covers the P5 stage of
# both flagship configs (20x20=400 at 640^2, 12x40=480 at the KITTI
# 384x1280) while excluding the 40x40=1600 level where 1x1 int8 measured
# slower than bf16.
_INT8_DEEP_HW = 512


def int8_conv(
    x: jax.Array, kernel: jax.Array, strides, padding, groups=1, dilation=1,
    act_scale=None,
):
    """Quantized conv: per-tensor activation scale (static when `act_scale`
    is given — fusable into the producer's epilogue — else a dynamic max-abs
    reduce), per-out-channel weight scale, int8 x int8 -> int32 on the MXU,
    dequantized output."""
    if act_scale is None:
        sx = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
    else:
        sx = jnp.asarray(act_scale, x.dtype)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        feature_group_count=groups,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(x.dtype) * (sx * sw[0, 0, 0]).astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-stat semantics (reference BatchNorm2d as
    configured by torch_utils.py:333 ``initialize_weights``).

    flax.linen.BatchNorm updates the running variance with the BIASED batch
    variance; torch uses the UNBIASED (Bessel-corrected) one. The two agree
    only as n -> inf — at the P5 level of a small training resolution the
    per-channel count n is tens, a multi-percent running-var divergence that
    shows up in EMA/eval forwards (found by the round-4 lockstep-trajectory
    campaign). Normalization itself uses the biased variance in both
    frameworks. Variable collections/names match flax BatchNorm exactly
    ('batch_stats' {mean,var}; params {scale,bias}), so checkpoints, the
    torch weight converter, and every existing test keep working.
    """

    use_running_average: Optional[bool] = None
    momentum: float = BN_MOMENTUM  # keep fraction (1 - torch momentum)
    epsilon: float = BN_EPS
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, use_running_average: Optional[bool] = None
    ) -> jax.Array:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.maximum(jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // feat  # per-channel sample count (B*H*W)
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)
        dtype = self.dtype or x.dtype
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dtype)
        return (x - mean.astype(dtype)) * mul + bias.astype(dtype)


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-shape padding (reference conv.py:28)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class Conv(nn.Module):
    """Conv2d + BatchNorm + SiLU (reference conv.py:103 ``Conv``).

    NHWC. ``g`` is the feature group count (depthwise when g == c_in).
    """

    c2: int
    k: Any = 1  # int or (kh, kw)
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Any = True  # True=SiLU, False=identity, or "relu"/"gelu"
    spd: bool = False  # exact space-to-depth rewrite of a k3/s2 stem conv
    deform: bool = False  # modulated deformable conv (reference conv.py:112)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # k may be an int or a (kh, kw) pair (C3x cross-convolutions)
        kh, kw = (self.k, self.k) if isinstance(self.k, int) else tuple(self.k)
        ph = autopad(kh, self.p, self.d)
        pw = autopad(kw, self.p, self.d)
        if self.deform:
            # the reference's deform path ignores groups/dilation
            x = DeformableConv2d(self.c2, kh, self.s, ph, name="conv")(x)
        elif self.spd:
            x = _SPDStemConv(
                self.c2, packed_input=(self.spd == "packed"), name="conv"
            )(x)
        elif _INT8_MODE and (
            _INT8_SCOPE == "all"
            or (kh >= 3 and self.g == 1)
            or (
                _INT8_SCOPE == "k3deep"
                and self.g == 1
                and x.shape[1] * x.shape[2] <= _INT8_DEEP_HW
            )
        ):
            # mixed-precision gate (measured on v5e b=128, PARITY.md round 2
            # + round-5 campaign): int8 wins on k>=3 dense convs (1.28-1.81x)
            # and — at the deep 20x20 stage only — also on 1x1 convs (3.2x,
            # tools/exp_pallas_campaign.py); high-res 1x1 convs LOSE
            # (quant/requant passes cost more than the matmul saves).
            # scope="k3" quantizes just the k>=3 winners; "k3deep" adds the
            # deep-stage 1x1s; "all" keeps the quantize-everything mode.
            x = _Int8Conv(
                self.c2, (kh, kw), (self.s, self.s),
                ((ph, ph), (pw, pw)), self.g, self.d, name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.c2,
                kernel_size=(kh, kw),
                strides=(self.s, self.s),
                padding=[(ph, ph), (pw, pw)],
                feature_group_count=self.g,
                kernel_dilation=(self.d, self.d),
                use_bias=False,
                dtype=x.dtype,
                name="conv",
            )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=x.dtype,
            name="bn",
        )(x)
        return apply_act(x, self.act)


class DeformableConv2d(nn.Module):
    """Modulated deformable conv v2 (reference conv.py:37): zero-init offset
    + modulator convs, regular weights applied through ops/deform.py. The
    modulator is 2*sigmoid (==1 at init, so the layer starts as a plain
    conv)."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.deform import deform_conv2d

        conv_args = dict(
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)],
            dtype=x.dtype,
        )
        offset = nn.Conv(
            2 * self.k * self.k, use_bias=True,
            kernel_init=nn.initializers.zeros, name="offset_conv", **conv_args
        )(x)
        modulator = 2.0 * jax.nn.sigmoid(
            nn.Conv(
                self.k * self.k, use_bias=True,
                kernel_init=nn.initializers.zeros, name="modulator_conv",
                **conv_args,
            )(x)
        )
        class _Regular(nn.Module):
            c2: int
            k: int
            bias: bool

            @nn.compact
            def __call__(self, x, offset, modulator, s, p):
                kernel = self.param(
                    "kernel",
                    nn.initializers.lecun_normal(),
                    (self.k, self.k, x.shape[-1], self.c2),
                )
                b = (
                    self.param("bias", nn.initializers.zeros, (self.c2,))
                    if self.bias
                    else None
                )
                return deform_conv2d(
                    x, offset, modulator, kernel.astype(x.dtype), b,
                    stride=(s, s), padding=(p, p),
                )

        return _Regular(self.c2, self.k, self.bias, name="regular_conv")(
            x, offset, modulator, self.s, self.p
        )


class _Int8Conv(nn.Module):
    """Quantized drop-in for nn.Conv with the SAME ``kernel`` param (HWIO,
    float) so checkpoints/param trees are unchanged; only the compute is
    int8 (see int8_conv above)."""

    c2: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    groups: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1] // self.groups, self.c2),
            jnp.float32,
        )
        return int8_conv(
            x, kernel.astype(x.dtype), self.strides, self.padding,
            self.groups, self.dilation, act_scale=_INT8_ACT_SCALE,
        )


class _SPDStemConv(nn.Module):
    """Exact MXU-friendly rewrite of a Conv(k=3, s=2, p=1, bias=False) stem.

    Declares the SAME ``kernel`` param (3,3,C,c2) as the nn.Conv it replaces,
    so parameter trees and checkpoints are identical; only the compute graph
    changes (space-to-depth packing + k2/s1 conv, see ops/spd_stem.py).
    Requires even input H/W — guaranteed by stride-multiple image sizes.
    """

    c2: int
    # packed_input: the serving contract where the device-preprocess stage
    # already emitted the (B, H/2, W/2, 4C) space-to-depth layout; the stem
    # skips the in-model pack (measured 0.95x when packed in the same jit)
    packed_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.spd_stem import packed_stem_conv, spd_stem_conv

        c_in = x.shape[-1] // 4 if self.packed_input else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, c_in, self.c2),
            jnp.float32,
        )
        if self.packed_input:
            return packed_stem_conv(x, kernel)
        return spd_stem_conv(x, kernel)


def apply_act(x: jax.Array, act) -> jax.Array:
    if act is True:
        return nn.silu(x)
    if act == "relu":
        return nn.relu(x)
    if act == "gelu":
        return nn.gelu(x)
    return x


class Conv2d(nn.Module):
    """Bare conv (torch nn.Conv2d equivalent) for head output layers."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = autopad(self.k, self.p)
        return nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            use_bias=self.bias,
            dtype=x.dtype,
        )(x)


class DWConv(nn.Module):
    """Depthwise Conv+BN+act (reference conv.py:170)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        import math

        g = math.gcd(x.shape[-1], self.c2)
        pad = autopad(self.k)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=g,
            use_bias=False,
            dtype=x.dtype,
            name="conv",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=x.dtype,
            name="bn",
        )(x)
        return apply_act(x, self.act)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py:327)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    def setup(self):
        c_ = int(self.c2 * self.e)
        self.cv1 = Conv(c_, self.k[0], 1)
        self.cv2 = Conv(self.c2, self.k[1], 1, g=self.g)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.cv2(self.cv1(x, train), train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class C2f(nn.Module):
    """Fast CSP bottleneck with 2 convs (reference block.py:216)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    def setup(self):
        self.c = int(self.c2 * self.e)
        self.cv1 = Conv(2 * self.c, 1, 1)
        self.cv2 = Conv(self.c2, 1)
        self.m = [
            Bottleneck(self.c, self.shortcut, self.g, k=(3, 3), e=1.0)
            for _ in range(self.n)
        ]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = list(jnp.split(self.cv1(x, train), 2, axis=-1))
        for m in self.m:
            y.append(m(y[-1], train))
        return self.cv2(jnp.concatenate(y, axis=-1), train)


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py:190)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def setup(self):
        self.c = int(self.c2 * self.e)
        self.cv1 = Conv(2 * self.c, 1, 1)
        self.cv2 = Conv(self.c2, 1)
        self.m = [
            Bottleneck(self.c, self.shortcut, self.g, k=(3, 3), e=1.0)
            for _ in range(self.n)
        ]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a, b = jnp.split(self.cv1(x, train), 2, axis=-1)
        for m in self.m:
            a = m(a, train)
        return self.cv2(jnp.concatenate([a, b], axis=-1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py:245) — v5-family."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def setup(self):
        c_ = int(self.c2 * self.e)
        self.cv1 = Conv(c_, 1, 1)
        self.cv2 = Conv(c_, 1, 1)
        self.cv3 = Conv(self.c2, 1)
        self.m = [
            Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0)
            for _ in range(self.n)
        ]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.cv1(x, train)
        for m in self.m:
            y = m(y, train)
        return self.cv3(jnp.concatenate([y, self.cv2(x, train)], axis=-1), train)


class SPP(nn.Module):
    """Spatial pyramid pooling (reference block.py:139)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, name="cv1")(x, train)
        pools = [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2)
            for k in self.k
        ]
        return Conv(self.c2, 1, 1, name="cv2")(
            jnp.concatenate([x] + pools, axis=-1), train
        )


class Proto(nn.Module):
    """Mask prototype head for segmentation (reference block.py:67)."""

    c_: int = 256
    c2: int = 32

    def setup(self):
        self.cv1 = Conv(self.c_, 3)
        # transpose_kernel=True matches torch ConvTranspose2d semantics and the
        # (in,out,kH,kW)->(kH,kW,out,in) layout our weight converter produces
        self.upsample = nn.ConvTranspose(
            features=self.c_, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
            use_bias=True, transpose_kernel=True,
        )
        self.cv2 = Conv(self.c_, 3)
        self.cv3 = Conv(self.c2, 1)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.cv1(x, train)
        x = self.upsample(x)
        x = self.cv2(x, train)
        return self.cv3(x, train)


class Focus(nn.Module):
    """Space-to-depth stem (reference conv.py:192) — v5-family."""

    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return Conv(self.c2, self.k, self.s, name="conv")(x, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference block.py:158)."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(
            t, (self.k, self.k), strides=(1, 1), padding=[(p, p), (p, p)]
        )
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return Conv(self.c2, 1, 1, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class SCDown(nn.Module):
    """Spatial-channel decoupled downsample (reference block.py:820)."""

    c2: int
    k: int = 3
    s: int = 2

    def setup(self):
        self.cv1 = Conv(self.c2, 1, 1)
        self.cv2 = Conv(self.c2, self.k, self.s, g=self.c2, act=False)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.cv2(self.cv1(x, train), train)


class RepVGGDW(nn.Module):
    """Reparameterisable depthwise block (reference block.py:702).

    Train form: 7x7 dw conv + 3x3 dw conv, summed, SiLU. The deploy-time
    ``fuse()`` folding is a pytree transform (see utils/fuse.py).
    """

    ed: int

    def setup(self):
        self.conv = Conv(self.ed, 7, 1, p=3, g=self.ed, act=False)
        self.conv1 = Conv(self.ed, 3, 1, p=1, g=self.ed, act=False)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.silu(self.conv(x, train) + self.conv1(x, train))


class CIB(nn.Module):
    """Compact inverted block (reference block.py:737)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        # torch wraps these in nn.Sequential named cv1 -> children cv1.0..cv1.4
        mods = [
            Conv(c1, 3, g=c1, name="cv1_0"),
            Conv(2 * c_, 1, name="cv1_1"),
            (
                RepVGGDW(2 * c_, name="cv1_2")
                if self.lk
                else Conv(2 * c_, 3, g=2 * c_, name="cv1_2")
            ),
            Conv(self.c2, 1, name="cv1_3"),
            Conv(self.c2, 3, g=self.c2, name="cv1_4"),
        ]
        y = x
        for m in mods:
            y = m(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks (reference block.py:760)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5

    def setup(self):
        self.c = int(self.c2 * self.e)
        self.cv1 = Conv(2 * self.c, 1, 1)
        self.cv2 = Conv(self.c2, 1)
        self.m = [
            CIB(self.c, self.shortcut, e=1.0, lk=self.lk) for _ in range(self.n)
        ]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = list(jnp.split(self.cv1(x, train), 2, axis=-1))
        for m in self.m:
            y.append(m(y[-1], train))
        return self.cv2(jnp.concatenate(y, axis=-1), train)


class Attention(nn.Module):
    """Single-scale MHSA with positional-encoding conv (reference block.py:771)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        N = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        h = self.dim + key_dim * self.num_heads * 2
        qkv = Conv(h, 1, act=False, name="qkv")(x, train)
        qkv = qkv.reshape(B, N, self.num_heads, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        pe = Conv(self.dim, 3, 1, g=self.dim, act=False, name="pe")(
            v.reshape(B, H, W, C), train
        )
        return Conv(self.dim, 1, act=False, name="proj")(out + pe, train)


class PSA(nn.Module):
    """Partial self-attention block (reference block.py:799)."""

    c2: int  # == c1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.c2 * self.e)
        ab = Conv(2 * c, 1, 1, name="cv1")(x, train)
        a, b = jnp.split(ab, 2, axis=-1)
        b = b + Attention(c, attn_ratio=0.5, num_heads=c // 64, name="attn")(b, train)
        ffn0 = Conv(c * 2, 1, name="ffn_0")(b, train)
        b = b + Conv(c, 1, act=False, name="ffn_1")(ffn0, train)
        return Conv(self.c2, 1, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class Concat(nn.Module):
    """Channel concat (reference conv.py:385)."""

    axis: int = -1

    def __call__(self, xs: Sequence[jax.Array]) -> jax.Array:
        return jnp.concatenate(list(xs), axis=self.axis)


class Upsample(nn.Module):
    """Nearest-neighbour 2x upsample (torch nn.Upsample(None, 2, 'nearest'))."""

    scale: int = 2

    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(x, self.scale, axis=1)
        return jnp.repeat(x, self.scale, axis=2)


class LightConv(nn.Module):
    """1x1 conv + depthwise conv (reference conv.py:154) — HGNetV2 block."""

    c2: int
    k: int = 1
    act: Any = "relu"

    def setup(self):
        self.conv1 = Conv(self.c2, 1, act=False)
        self.conv2 = Conv(self.c2, self.k, g=self.c2, act=self.act)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.conv2(self.conv1(x, train), train)


class RepConv(nn.Module):
    """RepVGG-style 3x3 + 1x1 parallel convs (reference conv.py:246)."""

    c2: int
    k: int = 3
    s: int = 1
    act: Any = True

    def setup(self):
        self.conv1 = Conv(self.c2, self.k, self.s, p=1, act=False)
        self.conv2 = Conv(self.c2, 1, self.s, p=0, act=False)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return apply_act(self.conv1(x, train) + self.conv2(x, train), self.act)


class RepC3(nn.Module):
    """RT-DETR neck CSP block over RepConvs (reference block.py:269)."""

    c2: int
    n: int = 3
    e: float = 1.0

    def setup(self):
        c_ = int(self.c2 * self.e)
        self.cv1 = Conv(self.c2, 1, 1)
        self.cv2 = Conv(self.c2, 1, 1)
        self.m = [RepConv(c_) for _ in range(self.n)]
        self._project = c_ != self.c2
        if self._project:
            self.cv3 = Conv(self.c2, 1, 1)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.cv1(x, train)
        for m in self.m:
            y = m(y, train)
        y = y + self.cv2(x, train)
        return self.cv3(y, train) if self._project else y


class HGStem(nn.Module):
    """PPHGNetV2 stem (reference block.py:88): 5 convs + maxpool."""

    cm: int
    c2: int

    def setup(self):
        self.stem1 = Conv(self.cm, 3, 2, act="relu")
        self.stem2a = Conv(self.cm // 2, 2, 1, p=0, act="relu")
        self.stem2b = Conv(self.cm, 2, 1, p=0, act="relu")
        self.stem3 = Conv(self.cm, 3, 2, act="relu")
        self.stem4 = Conv(self.c2, 1, 1, act="relu")

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.stem1(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = self.stem2a(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = self.stem2b(x2, train)
        # torch MaxPool2d(k=2, s=1, ceil_mode=True) on the padded map
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)])
        x1 = x1[:, : x2.shape[1], : x2.shape[2]]
        x = jnp.concatenate([x1, x2], axis=-1)
        x = self.stem3(x, train)
        return self.stem4(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block (reference block.py:118): n Light/standard convs +
    squeeze/excitation 1x1s."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False

    def setup(self):
        if self.lightconv:
            self.m = [LightConv(self.cm, self.k, act="relu") for _ in range(self.n)]
        else:
            self.m = [Conv(self.cm, self.k, act="relu") for _ in range(self.n)]
        self.sc = Conv(self.c2 // 2, 1, 1, act="relu")
        self.ec = Conv(self.c2, 1, 1, act="relu")

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = [x]
        for m in self.m:
            y.append(m(y[-1], train))
        out = self.ec(self.sc(jnp.concatenate(y, axis=-1), train), train)
        return out + x if (self.shortcut and x.shape[-1] == self.c2) else out


class RepBottleneck(nn.Module):
    """Bottleneck with a RepConv first conv (reference block.py:560)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def setup(self):
        c_ = int(self.c2 * self.e)
        self.cv1 = RepConv(c_, 3, 1)
        self.cv2 = Conv(self.c2, 3, 1, g=self.g)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.cv2(self.cv1(x, train), train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class RepCSP(nn.Module):
    """CSP over RepBottlenecks (reference block.py:577)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    def setup(self):
        c_ = int(self.c2 * self.e)
        self.cv1 = Conv(c_, 1, 1)
        self.cv2 = Conv(c_, 1, 1)
        self.cv3 = Conv(self.c2, 1)
        self.m = [RepBottleneck(c_, self.shortcut, e=1.0) for _ in range(self.n)]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.cv1(x, train)
        for m in self.m:
            y = m(y, train)
        return self.cv3(jnp.concatenate([y, self.cv2(x, train)], -1), train)


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN v9 block (reference block.py:594). args (c2, c3, c4, n)."""

    c2: int
    c3: int
    c4: int
    n: int = 1

    def setup(self):
        self.cv1 = Conv(self.c3, 1, 1)
        self.cv2 = [RepCSP(self.c4, self.n), Conv(self.c4, 3, 1)]
        self.cv3 = [RepCSP(self.c4, self.n), Conv(self.c4, 3, 1)]
        self.cv4 = Conv(self.c2, 1, 1)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = list(jnp.split(self.cv1(x, train), 2, axis=-1))
        for seq in (self.cv2, self.cv3):
            z = y[-1]
            for m in seq:
                z = m(z, train)
            y.append(z)
        return self.cv4(jnp.concatenate(y, -1), train)


class ADown(nn.Module):
    """v9 hybrid avg/max downsample (reference block.py:619)."""

    c2: int

    def setup(self):
        self.cv1 = Conv(self.c2 // 2, 3, 2, p=1)
        self.cv2 = Conv(self.c2 // 2, 1, 1, p=0)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = self.cv1(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x2 = self.cv2(x2, train)
        return jnp.concatenate([x1, x2], -1)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference block.py:639). args (c2, c3, k)."""

    c2: int
    c3: int
    k: int = 5

    def setup(self):
        self.cv1 = Conv(self.c3, 1, 1)
        self.cv5 = Conv(self.c2, 1, 1)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.k // 2
        pool = lambda t: nn.max_pool(t, (self.k, self.k), strides=(1, 1), padding=[(p, p)] * 2)
        y = [self.cv1(x, train)]
        for _ in range(3):
            y.append(pool(y[-1]))
        return self.cv5(jnp.concatenate(y, -1), train)


class Silence(nn.Module):
    """Identity passthrough (reference block.py:657)."""

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return x


class CBLinear(nn.Module):
    """Multi-branch linear projection (reference block.py:670): one conv whose
    output splits into the configured channel groups."""

    c2s: Tuple[int, ...]
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        pad = autopad(self.k)
        out = nn.Conv(
            sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
            padding=[(pad, pad)] * 2, use_bias=True, name="conv",
        )(x)
        splits = []
        start = 0
        for c in self.c2s:
            splits.append(out[..., start : start + c])
            start += c
        return tuple(splits)


class CBFuse(nn.Module):
    """Fuse CBLinear branches by nearest-upsampling to the last input's size
    and summing (reference block.py:688)."""

    idx: Tuple[int, ...]

    def __call__(self, xs, train: bool = False) -> jax.Array:
        target = xs[-1]
        th, tw = target.shape[1], target.shape[2]
        total = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]] if isinstance(x, (tuple, list)) else x
            fh = th // sel.shape[1]
            up = jnp.repeat(jnp.repeat(sel, fh, axis=1), tw // sel.shape[2], axis=2)
            total = total + up
        return total


def dfl_decode(box_logits: jax.Array, reg_max: int = 16) -> jax.Array:
    """Integral (DFL) box decode: softmax over reg_max bins -> expectation.

    Replaces the reference's fixed-weight 1x1 conv (block.py:44 ``DFL``):
    input (..., 4*reg_max) -> output (..., 4).
    """
    shape = box_logits.shape
    x = box_logits.reshape(*shape[:-1], 4, reg_max)
    p = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return (p * proj).sum(-1)


class GhostConv(nn.Module):
    """Ghost convolution (reference conv.py GhostConv): a primary conv plus a
    cheap depthwise expansion, concatenated."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, name="cv1")(x, train)
        z = Conv(c_, 5, 1, None, c_, act=self.act, name="cv2")(y, train)
        return jnp.concatenate([y, z], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference block.py GhostBottleneck)."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, name="conv_0")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, name="conv_1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="conv_2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, name="shortcut_0")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py C1)."""

    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = Conv(self.c2, 1, 1, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = Conv(self.c2, 3, name=f"m_{i}")(z, train)
        return z + y


class C3x(nn.Module):
    """C3 with cross ((1,3)/(3,1)) convolutions (reference block.py C3x)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y = Bottleneck(
                c_, self.shortcut, self.g, k=((1, 3), (3, 1)), e=1.0, name=f"m_{i}"
            )(y, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(jnp.concatenate([y, y2], -1), train)


class C3Ghost(nn.Module):
    """C3 with GhostBottlenecks (reference block.py C3Ghost)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y = GhostBottleneck(c_, name=f"m_{i}")(y, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(jnp.concatenate([y, y2], -1), train)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference block.py BottleneckCSP; the BN on
    the cat uses torch defaults eps 1e-5)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y = Bottleneck(c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")(y, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, name="cv3")(y)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, name="cv2")(x)
        cat = jnp.concatenate([y1, y2], -1)
        # eps/momentum: the reference's initialize_weights forces 1e-3/0.03
        # on EVERY BatchNorm2d (torch_utils.py:333-335), this one included
        cat = TorchBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn"
        )(cat)
        return Conv(self.c2, 1, 1, name="cv4")(nn.silu(cat), train)


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block (reference block.py ResNetBlock)."""

    c2: int
    s: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c3 = self.e * self.c2
        y = Conv(self.c2, 1, 1, name="cv1")(x, train)
        y = Conv(self.c2, 3, self.s, 1, name="cv2")(y, train)
        y = Conv(c3, 1, act=False, name="cv3")(y, train)
        if self.s != 1 or x.shape[-1] != c3:
            sc = Conv(c3, 1, self.s, act=False, name="shortcut_0")(x, train)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNetLayer(nn.Module):
    """Stack of ResNet blocks / stem (reference block.py ResNetLayer)."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.is_first:
            x = Conv(self.c2, 7, 2, 3, name="layer_0")(x, train)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            return x
        x = ResNetBlock(self.c2, self.s, self.e, name="layer_0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.c2, 1, self.e, name=f"layer_{i}")(x, train)
        return x


class ConvTransposeBlock(nn.Module):
    """ConvTranspose2d + BN + SiLU (reference conv.py ConvTranspose)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # torch ConvTranspose2d: out = (H-1)*s - 2p + k; flax VALID gives
        # (H-1)*s + k, so crop p from each side
        x = nn.ConvTranspose(
            self.c2, (self.k, self.k), strides=(self.s, self.s),
            padding="VALID", use_bias=not self.bn,
            transpose_kernel=True, name="conv_transpose",
        )(x)
        if self.p:
            x = x[:, self.p : -self.p, self.p : -self.p]
        if self.bn:
            x = TorchBatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, name="bn",
            )(x)
        return apply_act(x, self.act)


class ChannelAttention(nn.Module):
    """Squeeze-excite-style channel gate (reference conv.py ChannelAttention)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name="fc")(p)
        return x * jax.nn.sigmoid(g)


class SpatialAttention(nn.Module):
    """Mean/max-pool spatial gate (reference conv.py SpatialAttention)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = 3 if self.kernel_size == 7 else 1
        s = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], -1
        )
        g = nn.Conv(
            1, (self.kernel_size, self.kernel_size),
            padding=[(pad, pad), (pad, pad)], use_bias=False, name="cv1",
        )(s)
        return x * jax.nn.sigmoid(g)


class CBAM(nn.Module):
    """Convolutional block attention (reference conv.py CBAM)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ChannelAttention(name="channel_attention")(x)
        return SpatialAttention(self.kernel_size, name="spatial_attention")(x)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner (reference block.py C3TR)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from .transformer import TransformerBlock

        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        y = TransformerBlock(c_, 4, self.n, name="m")(y, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(jnp.concatenate([y, y2], -1), train)
