"""Transformer modules for RT-DETR (reference: nn/modules/transformer.py —
AIFI:86, MLP:174, MSDeformAttn:216, DeformableTransformerDecoder(Layer):310,373;
nn/modules/utils.py multi_scale_deformable_attn_pytorch).

TPU notes: deformable attention's grid_sample becomes an explicit gather +
bilinear lerp (XLA-regular); everything is fixed-shape.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


class MLP(nn.Module):
    """Simple FFN (reference transformer.py:174)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MultiheadAttention(nn.Module):
    """torch-style MHA: fused in-projection + out projection."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jax.Array] = None):
        d = self.d_model
        h = self.num_heads
        hd = d // h
        qkv_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qp = q @ qkv_w[:d].T + qkv_b[:d]
        kp = k @ qkv_w[d : 2 * d].T + qkv_b[d : 2 * d]
        vp = v @ qkv_w[2 * d :].T + qkv_b[2 * d :]
        B, Lq = qp.shape[:2]
        Lk = kp.shape[1]
        qp = qp.reshape(B, Lq, h, hd)
        kp = kp.reshape(B, Lk, h, hd)
        vp = vp.reshape(B, Lk, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / math.sqrt(hd)
        if attn_mask is not None:
            attn = jnp.where(attn_mask[None, None], -1e9, attn) if attn_mask.ndim == 2 else attn + attn_mask
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(B, Lq, d)
        return nn.Dense(d, name="out_proj")(out)


class AIFI(nn.Module):
    """Intra-scale transformer encoder on the P5 map (reference
    transformer.py:86): 2D sincos positions + one post-norm encoder layer."""

    c1: int
    cm: int = 2048
    num_heads: int = 8

    @staticmethod
    def pos_embedding(w: int, h: int, dim: int, temperature: float = 10000.0):
        grid_w = jnp.arange(w, dtype=jnp.float32)
        grid_h = jnp.arange(h, dtype=jnp.float32)
        gw, gh = jnp.meshgrid(grid_w, grid_h, indexing="ij")
        pos_dim = dim // 4
        omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
        out_w = gw.reshape(-1, 1) * omega[None]
        out_h = gh.reshape(-1, 1) * omega[None]
        return jnp.concatenate(
            [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], 1
        )[None]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        # NOTE upstream quirk preserved for parity: the reference builds the
        # position table with a (w, h) 'ij' meshgrid flattened w-major but adds
        # it to h-major flattened tokens (transformer.py:98-117) — the trained
        # weights absorb the mismatch, so replicate it verbatim
        pos = self.pos_embedding(W, H, C)
        src = x.reshape(B, H * W, C)
        q = k = src + pos
        attn_out = MultiheadAttention(C, self.num_heads, name="ma")(q, k, src)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn_out)
        ffn = nn.Dense(self.cm, name="fc1")(src)
        ffn = nn.Dense(C, name="fc2")(nn.gelu(ffn, approximate=False))
        src = nn.LayerNorm(epsilon=1e-5, name="norm2")(src + ffn)
        return src.reshape(B, H, W, C)


def bilinear_sample(value: jax.Array, grid: jax.Array) -> jax.Array:
    """grid_sample(align_corners=False, zeros padding) equivalent.

    value: (N, H, W, C); grid: (N, P, 2) in [-1, 1] (x, y). -> (N, P, C)."""
    N, H, W, C = value.shape
    x = (grid[..., 0] + 1) * W / 2 - 0.5
    y = (grid[..., 1] + 1) * H / 2 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(N, H * W, C)
        idx = yi_c * W + xi_c
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * inside[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    w00 = ((1 - dx) * (1 - dy))[..., None]
    w01 = (dx * (1 - dy))[..., None]
    w10 = ((1 - dx) * dy)[..., None]
    w11 = (dx * dy)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def ms_deformable_attention(
    value: jax.Array,               # (B, Lv, nh, hd)
    value_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,  # (B, Lq, nh, nl, np, 2) in [0,1]
    attention_weights: jax.Array,   # (B, Lq, nh, nl, np)
) -> jax.Array:
    """multi_scale_deformable_attn_pytorch equivalent (utils.py:33)."""
    B, Lv, nh, hd = value.shape
    _, Lq = sampling_locations.shape[:2]
    splits = [h * w for h, w in value_shapes]
    offsets = [0]
    for s in splits:
        offsets.append(offsets[-1] + s)
    grids = 2 * sampling_locations - 1
    out_levels = []
    for lvl, (h, w) in enumerate(value_shapes):
        v = value[:, offsets[lvl] : offsets[lvl + 1]]  # (B, h*w, nh, hd)
        v = v.transpose(0, 2, 1, 3).reshape(B * nh, h, w, hd)
        g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4).reshape(B * nh, Lq * grids.shape[4], 2)
        sampled = bilinear_sample(v, g).reshape(B, nh, Lq, grids.shape[4], hd)
        out_levels.append(sampled)
    # (B, nh, Lq, nl, np, hd)
    stacked = jnp.stack(out_levels, axis=3)
    w = attention_weights.transpose(0, 2, 1, 3, 4)  # (B, nh, Lq, nl, np)
    out = (stacked * w[..., None]).sum((3, 4))      # (B, nh, Lq, hd)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, nh * hd)


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (reference transformer.py:216)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes):
        B, Lq = query.shape[:2]
        Lv = value.shape[1]
        nh, nl, npnt = self.n_heads, self.n_levels, self.n_points
        v = nn.Dense(self.d_model, name="value_proj")(value)
        v = v.reshape(B, Lv, nh, self.d_model // nh)
        offs = nn.Dense(nh * nl * npnt * 2, name="sampling_offsets")(query)
        offs = offs.reshape(B, Lq, nh, nl, npnt, 2)
        aw = nn.Dense(nh * nl * npnt, name="attention_weights")(query)
        aw = jax.nn.softmax(aw.reshape(B, Lq, nh, nl * npnt), -1).reshape(B, Lq, nh, nl, npnt)
        if refer_bbox.shape[-1] == 2:
            normalizer = jnp.array([[w, h] for h, w in value_shapes], jnp.float32)
            loc = refer_bbox[:, :, None, :, None, :] + offs / normalizer[None, None, None, :, None, :]
        else:
            loc = (
                refer_bbox[:, :, None, :, None, :2]
                + offs / npnt * refer_bbox[:, :, None, :, None, 2:] * 0.5
            )
        out = ms_deformable_attention(v, value_shapes, loc, aw)
        return nn.Dense(self.d_model, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:310)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None):
        q = k = embed + query_pos if query_pos is not None else embed
        tgt = MultiheadAttention(self.d_model, self.n_heads, name="self_attn")(
            q, k, embed, attn_mask
        )
        embed = nn.LayerNorm(epsilon=1e-5, name="norm1")(embed + tgt)
        tgt = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, name="cross_attn"
        )(
            embed + query_pos if query_pos is not None else embed,
            refer_bbox[:, :, None],
            feats,
            shapes,
        )
        embed = nn.LayerNorm(epsilon=1e-5, name="norm2")(embed + tgt)
        ffn = nn.Dense(self.d_ffn, name="linear1")(embed)
        ffn = nn.Dense(self.d_model, name="linear2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(embed + ffn)


class TransformerLayer(nn.Module):
    """LayerNorm-free ViT layer (reference nn/modules/transformer.py:13
    TransformerLayer): q/k/v linears into torch-layout MHA + 2-linear FFN,
    both residual. Operates batch-first (B, L, C)."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = nn.Dense(self.c, use_bias=False, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, name="v")(x)
        x = MultiheadAttention(self.c, self.num_heads, name="ma")(q, k, v) + x
        y = nn.Dense(self.c, use_bias=False, name="fc1")(x)
        return nn.Dense(self.c, use_bias=False, name="fc2")(y) + x


class TransformerBlock(nn.Module):
    """ViT block over a feature map (reference transformer.py:41
    TransformerBlock): optional 1x1 Conv, learned positional linear, stacked
    TransformerLayers. NHWC in/out."""

    c2: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from .modules import Conv

        if x.shape[-1] != self.c2:
            x = Conv(self.c2, name="conv")(x, train)
        B, H, W, C = x.shape
        # torch flattens (B,C,H,W).flatten(2) -> row-major H*W tokens and
        # reshapes back the same way (its `w, h` unpack is mislabeled but
        # self-consistent), so a plain reshape matches
        p = x.reshape(B, H * W, C)
        p = p + nn.Dense(self.c2, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, name=f"tr_{i}")(p)
        return p.reshape(B, H, W, C)
