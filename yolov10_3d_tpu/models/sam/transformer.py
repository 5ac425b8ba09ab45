"""SAM two-way transformer (reference: models/sam/modules/transformer.py).

Token<->image cross attention with optional head down-projection. NHWC image
embeddings are flattened by the caller (MaskDecoder). All LayerNorms use the
torch default eps 1e-5.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoders import MLPBlock


class DownsampleAttention(nn.Module):
    """Attention with separate q/k/v projections and an internal-dim
    downsample (reference transformer.py:205 Attention)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        internal = self.embedding_dim // self.downsample_rate
        hd = internal // self.num_heads

        def heads(x):  # (B, N, internal) -> (B, heads, N, hd)
            B, N, _ = x.shape
            return x.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(internal, name="q_proj")(q))
        k = heads(nn.Dense(internal, name="k_proj")(k))
        v = heads(nn.Dense(internal, name="v_proj")(v))
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) / jnp.sqrt(jnp.float32(hd)).astype(q.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        B, _, N, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, internal)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Self-attn on tokens, token->image cross, MLP, image->token cross
    (reference transformer.py:116)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(
        self, queries: jax.Array, keys: jax.Array, query_pe: jax.Array, key_pe: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        d, h = self.embedding_dim, self.num_heads
        if self.skip_first_layer_pe:
            queries = DownsampleAttention(d, h, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampleAttention(d, h, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampleAttention(
            d, h, self.attention_downsample_rate, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, d, act="relu", name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampleAttention(
            d, h, self.attention_downsample_rate, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Stack of TwoWayAttentionBlocks + final token->image attention
    (reference transformer.py:12)."""

    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(
        self, image_embedding: jax.Array, image_pe: jax.Array, point_embedding: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """image_embedding/image_pe: (B, N_img, C) flattened NHWC;
        point_embedding: (B, N_pts, C). Returns (queries, keys)."""
        queries, keys = point_embedding, image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim,
                self.num_heads,
                self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers_{i}",
            )(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + DownsampleAttention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys
