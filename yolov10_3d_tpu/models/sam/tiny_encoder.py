"""TinyViT image encoder for MobileSAM (reference:
models/sam/modules/tiny_encoder.py, a LeViT/Swin hybrid).

TPU-first: NHWC feature maps end-to-end (tokens are only materialized inside
window attention, where the window partition is a static reshape), LeViT
attention biases gathered through a compile-time offset table, BN in eval
mode fused by XLA. Names mirror the torch state_dict (Conv2d_BN children
``c``/``bn``; stages ``layers_i``; blocks ``blocks_j``).
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .encoders import layer_norm_2d, window_partition, window_unpartition
from ...nn.modules import TorchBatchNorm


class Conv2dBN(nn.Module):
    """Conv (no bias) + BatchNorm (reference tiny_encoder.py:23 Conv2d_BN;
    torch BatchNorm2d defaults: eps 1e-5)."""

    b: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.b,
            (self.ks, self.ks),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=x.dtype,
            name="c",
        )(x)
        return TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=x.dtype, name="bn",
        )(x)


class PatchEmbedTiny(nn.Module):
    """Two stride-2 Conv2d_BN with GELU between: 4x downsample
    (reference tiny_encoder.py:38 PatchEmbed)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv2dBN(self.embed_dim // 2, 3, 2, 1, name="seq_0")(x, train)
        x = nn.gelu(x, approximate=False)
        return Conv2dBN(self.embed_dim, 3, 2, 1, name="seq_2")(x, train)


class MBConv(nn.Module):
    """Mobile inverted bottleneck (reference tiny_encoder.py:63)."""

    out_chans: int
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(x.shape[-1] * self.expand_ratio)
        shortcut = x
        x = nn.gelu(Conv2dBN(hidden, 1, name="conv1")(x, train), approximate=False)
        x = nn.gelu(
            Conv2dBN(hidden, 3, 1, 1, groups=hidden, name="conv2")(x, train),
            approximate=False,
        )
        x = Conv2dBN(self.out_chans, 1, name="conv3")(x, train)
        return nn.gelu(x + shortcut, approximate=False)


class PatchMerging(nn.Module):
    """1x1 expand -> dw 3x3 (stride 2 unless out_dim in {320,448,576}) ->
    1x1 (reference tiny_encoder.py:101)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = nn.gelu(Conv2dBN(self.out_dim, 1, name="conv1")(x, train), approximate=False)
        x = nn.gelu(
            Conv2dBN(self.out_dim, 3, stride, 1, groups=self.out_dim, name="conv2")(x, train),
            approximate=False,
        )
        return Conv2dBN(self.out_dim, 1, name="conv3")(x, train)


def _attention_offsets(resolution: Tuple[int, int]) -> Tuple[np.ndarray, int]:
    """Static LeViT bias index table: (N, N) offset ids and the number of
    unique offsets (reference tiny_encoder.py:278-289; the idx buffer is
    non-persistent in torch, so it is recomputed here, never converted)."""
    points = list(itertools.product(range(resolution[0]), range(resolution[1])))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


class TinyAttention(nn.Module):
    """LeViT-style attention with trained per-offset biases
    (reference tiny_encoder.py:231 Attention; attn_ratio=1 in TinyViT)."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int = 1
    resolution: Tuple[int, int] = (7, 7)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, _ = x.shape
        nh_kd = self.key_dim * self.num_heads
        d = int(self.attn_ratio * self.key_dim)
        dh = d * self.num_heads
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(dh + 2 * nh_kd, name="qkv")(x)
        qkv = qkv.reshape(B, N, self.num_heads, -1)
        q, k, v = jnp.split(qkv, [self.key_dim, 2 * self.key_dim], axis=3)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        idx_table, n_offsets = _attention_offsets(self.resolution)
        biases = self.param(
            "attention_biases", nn.initializers.zeros, (self.num_heads, n_offsets)
        )
        bias = biases[:, idx_table]  # (heads, N, N)

        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * (self.key_dim**-0.5) + bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, dh)
        return nn.Dense(self.dim, name="proj")(out)


class TinyMlp(nn.Module):
    """LayerNorm -> fc1 -> GELU -> fc2 (reference tiny_encoder.py:203)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.gelu(nn.Dense(self.hidden, name="fc1")(x), approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class TinyViTBlock(nn.Module):
    """Window attention + depthwise local conv + MLP, all residual
    (reference tiny_encoder.py:324). Operates on NHWC."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    local_conv_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        res_x = x
        ws = self.window_size
        attn = TinyAttention(
            self.dim,
            self.dim // self.num_heads,
            self.num_heads,
            attn_ratio=1,
            resolution=(ws, ws),
            name="attn",
        )
        if H == ws and W == ws:
            x = attn(x.reshape(B, H * W, C)).reshape(B, H, W, C)
        else:
            win, pad_hw = window_partition(x, ws)
            nB = win.shape[0]
            a = attn(win.reshape(nB, ws * ws, C))
            x = window_unpartition(a.reshape(nB, ws, ws, C), ws, pad_hw, (H, W))
        x = res_x + x

        x = Conv2dBN(
            C, self.local_conv_size, 1, self.local_conv_size // 2, groups=C,
            name="local_conv",
        )(x, train)

        t = x.reshape(B, H * W, C)
        t = t + TinyMlp(int(C * self.mlp_ratio), C, name="mlp")(t)
        return t.reshape(B, H, W, C)


class TinyViT(nn.Module):
    """MobileSAM image encoder (reference tiny_encoder.py:537).

    (B, H, W, 3) NHWC -> (B, H/16, W/16, 256). The classifier head
    (norm_head/head) is detection-irrelevant and omitted; torch checkpoints'
    extra keys are ignored by the converter.
    """

    img_size: int = 1024
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    out_chans: int = 256

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dims = list(self.embed_dims)
        x = PatchEmbedTiny(dims[0], name="patch_embed")(x, train)

        n_layers = len(self.depths)
        for i in range(n_layers):
            prefix = f"layers_{i}"
            for j in range(self.depths[i]):
                if i == 0:
                    x = MBConv(
                        dims[0], self.mbconv_expand_ratio,
                        name=f"{prefix}_blocks_{j}",
                    )(x, train)
                else:
                    x = TinyViTBlock(
                        dim=dims[i],
                        num_heads=self.num_heads[i],
                        window_size=self.window_sizes[i],
                        mlp_ratio=self.mlp_ratio,
                        local_conv_size=self.local_conv_size,
                        name=f"{prefix}_blocks_{j}",
                    )(x, train)
            if i < n_layers - 1:
                x = PatchMerging(dims[i + 1], name=f"{prefix}_downsample")(x, train)

        # SAM neck (reference tiny_encoder.py:656)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = layer_norm_2d(x, "neck_1")
        x = nn.Conv(
            self.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="neck_2",
        )(x)
        return layer_norm_2d(x, "neck_3")
