"""YOLO-World modules: text-guided detection (reference: nn/modules/block.py
MaxSigmoidAttnBlock:406, C2fAttn:441, ImagePoolingAttn:470,
ContrastiveHead:516, BNContrastiveHead:535; head.py WorldDetect:232).

NHWC; text features are an explicit (B, K, ct) input threaded by YOLOModel
(the CLIP text encoder is external/offline — see engine/world.py
set_classes for the pluggable encoder hook).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Bottleneck, Conv
from .heads import REG_MAX, _box_branch, _conv1x1, _run_seq


class MaxSigmoidAttnBlock(nn.Module):
    """Per-head max text-similarity gate on a conv projection
    (reference block.py:406)."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, guide: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, c1 = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, name="gl")(guide)  # (B, K, ec)
        g = g.reshape(B, -1, self.nh, self.ec // self.nh)
        embed = Conv(self.ec, 1, act=False, name="ec")(x, train) if c1 != self.ec else x
        e = embed.reshape(B, H, W, self.nh, self.ec // self.nh)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", e, g).max(-1)  # (B, H, W, nh)
        aw = aw / (self.ec // self.nh) ** 0.5
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias)
        p = Conv(self.c2, 3, act=False, name="proj_conv")(x, train)
        p = p.reshape(B, H, W, self.nh, hc) * aw[..., None]
        return p.reshape(B, H, W, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention branch (reference block.py:441)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, guide: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, e=1.0, name=f"m_{i}")(ys[-1], train)
            )
        ys.append(
            MaxSigmoidAttnBlock(c, self.nh, self.ec, self.gc, name="attn")(
                ys[-1], guide, train
            )
        )
        return Conv(self.c2, 1, name="cv2")(jnp.concatenate(ys, -1), train)


def _adaptive_max_pool(x: jax.Array, k: int) -> jax.Array:
    """torch AdaptiveMaxPool2d((k, k)) on NHWC: bin i spans
    [floor(i*S/k), ceil((i+1)*S/k)) — static slices."""
    B, H, W, C = x.shape
    rows = []
    for i in range(k):
        y0, y1 = (i * H) // k, -(-((i + 1) * H) // k)
        cols = []
        for j in range(k):
            x0, x1 = (j * W) // k, -(-((j + 1) * W) // k)
            cols.append(x[:, y0:y1, x0:x1].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, 1))
    return jnp.stack(rows, 1)  # (B, k, k, C)


class ImagePoolingAttn(nn.Module):
    """Text embeddings attend over pooled image patches
    (reference block.py:470)."""

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    use_scale: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], text: jax.Array) -> jax.Array:
        B = xs[0].shape[0]
        hc = self.ec // self.nh
        patches = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.ec, (1, 1), use_bias=True, name=f"projections_{i}")(x)
            patches.append(_adaptive_max_pool(p, self.k).reshape(B, self.k * self.k, self.ec))
        img = jnp.concatenate(patches, 1)  # (B, nf*k^2, ec)

        q = nn.Dense(self.ec, name="query_1")(
            nn.LayerNorm(epsilon=1e-5, name="query_0")(text)
        )
        k = nn.Dense(self.ec, name="key_1")(
            nn.LayerNorm(epsilon=1e-5, name="key_0")(img)
        )
        v = nn.Dense(self.ec, name="value_1")(
            nn.LayerNorm(epsilon=1e-5, name="value_0")(img)
        )
        q = q.reshape(B, -1, self.nh, hc)
        k = k.reshape(B, -1, self.nh, hc)
        v = v.reshape(B, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, k) / hc**0.5
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, -1, self.ec)
        out = nn.Dense(self.ct, name="proj")(out)
        scale = (
            self.param("scale", nn.initializers.zeros, (1,))
            if self.use_scale
            else 1.0
        )
        return out * scale + text


class ContrastiveHead(nn.Module):
    """Region-text similarity with learned temperature
    (reference block.py:516)."""

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, train: bool = False) -> jax.Array:
        bias = self.param("bias", nn.initializers.zeros, ())
        logit_scale = self.param(
            "logit_scale", lambda *_: jnp.log(jnp.asarray(1 / 0.07)), ()
        )
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of the contrastive head (reference block.py:535)."""

    embed_dims: int

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, train: bool = False) -> jax.Array:
        from .modules import BN_EPS, BN_MOMENTUM, TorchBatchNorm

        x = TorchBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, name="norm",
        )(x)
        bias = self.param("bias", nn.initializers.zeros, ())
        logit_scale = self.param(
            "logit_scale", lambda *_: -jnp.ones(()), ()
        )
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return sim * jnp.exp(logit_scale) + bias


class WorldDetect(nn.Module):
    """Text-prompted detection head (reference head.py:232): DFL box branch
    + embedding branch scored against text features."""

    nc: int
    ch: Tuple[int, ...]
    embed: int = 512
    with_bn: bool = False

    def setup(self):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        self.cv2 = [_box_branch(x, c2, REG_MAX) for x in self.ch]
        self.cv3 = [
            [Conv(c3, 3), Conv(c3, 3), _conv1x1(self.embed)] for _ in self.ch
        ]
        self.cv4 = [
            BNContrastiveHead(self.embed) if self.with_bn else ContrastiveHead()
            for _ in self.ch
        ]

    def __call__(self, xs: Sequence[jax.Array], text: jax.Array, train: bool = False):
        """Per-scale (B, H, W, 4*reg_max + K) maps; K = text.shape[1]."""
        return [
            jnp.concatenate(
                [
                    _run_seq(self.cv2[i], x, train),
                    self.cv4[i](_run_seq(self.cv3[i], x, train), text, train),
                ],
                axis=-1,
            )
            for i, x in enumerate(xs)
        ]
