"""SAM image + prompt encoders (reference: models/sam/modules/encoders.py).

TPU-first: NHWC throughout, static window partitioning (pure reshapes with a
compile-time pad), decomposed relative position bias gathered with static
index tables, fixed-shape point prompts (pad with label -1). Flax module /
parameter names mirror the torch state_dict so `convert_torch_state_dict`
re-keys checkpoints directly (e.g. ``image_encoder.blocks.0.attn.qkv.weight``
-> ``image_encoder/blocks_0/attn/qkv/kernel``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def layer_norm_2d(x: jax.Array, name: str) -> "nn.Module":
    """Channel LayerNorm over NHWC's last axis (reference transformer.py:191
    LayerNorm2d, eps 1e-6, biased variance)."""
    return nn.LayerNorm(epsilon=1e-6, name=name)(x)


class MLPBlock(nn.Module):
    """lin1 -> GELU -> lin2 (reference nn/modules/transformer.py:159)."""

    mlp_dim: int
    out_dim: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return nn.Dense(self.out_dim, name="lin2")(x)


def _rel_pos_index(q_size: int, k_size: int) -> np.ndarray:
    """Static gather indices for decomposed relative position
    (reference encoders.py:503 get_rel_pos; q_size == k_size in every SAM
    configuration, so no interpolation branch is needed)."""
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return ((q - k) + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int32)


class ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative position bias
    (reference encoders.py:397 Attention + :536 add_decomposed_rel_pos)."""

    dim: int
    num_heads: int
    use_rel_pos: bool
    input_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, name="qkv")(x)  # (B, H, W, 3*dim)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, N, heads, hd)
        q = q.transpose(0, 2, 1, 3)  # (B, heads, N, hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k)

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim)
            )
            Rh = rel_pos_h[_rel_pos_index(H, H)]  # (H, H, hd)
            Rw = rel_pos_w[_rel_pos_index(W, W)]  # (W, W, hd)
            r_q = q.reshape(B, self.num_heads, H, W, head_dim)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(B, self.num_heads, H * W, H * W)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def window_partition(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B,H,W,C) -> (B*nw, ws, ws, C) with static zero pad
    (reference encoders.py:453)."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp)


def window_unpartition(
    win: jax.Array, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    """Inverse of window_partition (reference encoders.py:477)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional window attention
    (reference encoders.py:332 Block)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    use_rel_pos: bool
    window_size: int
    input_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        attn_size = (
            (self.window_size, self.window_size) if self.window_size > 0 else self.input_size
        )
        x = ViTAttention(
            self.dim, self.num_heads, self.use_rel_pos, attn_size, name="attn"
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """ViTDet-style SAM image encoder (reference encoders.py:13).

    NHWC in, NHWC (B, H/16, W/16, out_chans) out.
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        grid = self.img_size // self.patch_size

        class _PatchEmbed(nn.Module):
            patch_size: int
            embed_dim: int

            @nn.compact
            def __call__(self, x):
                return nn.Conv(
                    self.embed_dim,
                    kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID",
                    name="proj",
                )(x)

        x = _PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(x)
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
        )
        x = x + pos_embed

        for i in range(self.depth):
            x = ViTBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_rel_pos=self.use_rel_pos,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(grid, grid),
                name=f"blocks_{i}",
            )(x)

        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (reference encoders.py:98)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = layer_norm_2d(x, "neck_1")
        x = nn.Conv(
            self.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="neck_2"
        )(x)
        return layer_norm_2d(x, "neck_3")


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference encoders.py:288)."""

    num_pos_feats: int = 64

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        """coords in [0,1]^2, shape (..., 2) -> (..., 2*num_pos_feats)."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(stddev=1.0),
            (2, self.num_pos_feats),
        )
        c = (2.0 * coords - 1.0) @ gauss
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid_pe(self, size: Tuple[int, int]) -> jax.Array:
        """Dense PE for an (h, w) grid -> (h, w, C) NHWC
        (reference encoders.py:311 forward)."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(
            [jnp.broadcast_to(x[None, :], (h, w)), jnp.broadcast_to(y[:, None], (h, w))],
            axis=-1,
        )
        return self(coords)


class PromptEncoder(nn.Module):
    """Point / box / mask prompt encoder (reference encoders.py:128).

    Fixed-shape API: points are always (B, N, 2) with labels (B, N) in
    {-1 pad, 0 negative, 1 positive}; the torch "pad when no boxes" behavior
    is reproduced by the caller appending one (0,0)/-1 point. Boxes are
    (B, 2, 2) corner pairs. Presence of each prompt type is a static flag.
    """

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = [
            nn.Embed(1, self.embed_dim, name=f"point_embeddings_{i}") for i in range(4)
        ]
        self.not_a_point_embed = nn.Embed(1, self.embed_dim)
        self.no_mask_embed = nn.Embed(1, self.embed_dim)
        c = self.mask_in_chans
        self.mask_downscaling_0 = nn.Conv(c // 4, (2, 2), strides=(2, 2), padding="VALID")
        self.mask_downscaling_1 = nn.LayerNorm(epsilon=1e-6)
        self.mask_downscaling_3 = nn.Conv(c, (2, 2), strides=(2, 2), padding="VALID")
        self.mask_downscaling_4 = nn.LayerNorm(epsilon=1e-6)
        self.mask_downscaling_6 = nn.Conv(self.embed_dim, (1, 1))

    def _pe_coords(self, coords: jax.Array) -> jax.Array:
        """Encode pixel coords against the input image size
        (reference encoders.py:324 forward_with_coords)."""
        h, w = self.input_image_size
        c = coords / jnp.asarray([w, h], coords.dtype)
        return self.pe_layer(c)

    def get_dense_pe(self) -> jax.Array:
        """(1, h, w, embed_dim) dense grid PE (reference encoders.py:191)."""
        return self.pe_layer.grid_pe(self.image_embedding_size)[None]

    def embed_points(self, points: jax.Array, labels: jax.Array) -> jax.Array:
        """(B, N, 2) pixel coords + (B, N) labels -> (B, N, embed_dim)
        (reference encoders.py:201 _embed_points)."""
        pe = self._pe_coords(points + 0.5)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, self.not_a_point_embed.embedding[0], 0.0)
        pe = pe + jnp.where(lab == 0, self.point_embeddings[0].embedding[0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embeddings[1].embedding[0], 0.0)
        return pe

    def embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """(B, 4) xyxy -> (B, 2, embed_dim) corner tokens
        (reference encoders.py:216 _embed_boxes)."""
        coords = boxes.reshape(-1, 2, 2) + 0.5
        pe = self._pe_coords(coords)
        corner = jnp.stack(
            [
                pe[:, 0] + self.point_embeddings[2].embedding[0],
                pe[:, 1] + self.point_embeddings[3].embedding[0],
            ],
            axis=1,
        )
        return corner

    def embed_masks(self, masks: jax.Array) -> jax.Array:
        """(B, 4h, 4w, 1) mask input -> (B, h, w, embed_dim)
        (reference encoders.py:225)."""
        x = self.mask_downscaling_0(masks)
        x = nn.gelu(self.mask_downscaling_1(x), approximate=False)
        x = self.mask_downscaling_3(x)
        x = nn.gelu(self.mask_downscaling_4(x), approximate=False)
        return self.mask_downscaling_6(x)

    def no_mask_dense(self, bs: int) -> jax.Array:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.embedding[0][None, None, None, :],
            (bs, h, w, self.embed_dim),
        )

    def __call__(
        self,
        points: Optional[Tuple[jax.Array, jax.Array]] = None,
        boxes: Optional[jax.Array] = None,
        masks: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (sparse (B, N, D), dense (B, h, w, D)). Presence of each
        prompt type is static (None or array), mirroring reference
        encoders.py:249 forward."""
        if self.is_initializing():
            # touch every branch so the full parameter tree exists no matter
            # which prompts the init call used (flax setup params are lazy)
            h, w = self.image_embedding_size
            self.embed_points(jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32))
            self.embed_boxes(jnp.zeros((1, 4)))
            self.embed_masks(jnp.zeros((1, 4 * h, 4 * w, 1)))
            self.no_mask_dense(1)
        if points is not None:
            coords, labels = points
            if boxes is None:  # torch pads with one (0,0)/-1 point
                coords = jnp.concatenate(
                    [coords, jnp.zeros_like(coords[:, :1])], axis=1
                )
                labels = jnp.concatenate(
                    [labels, -jnp.ones_like(labels[:, :1])], axis=1
                )
            sparse = self.embed_points(coords, labels)
            bs = coords.shape[0]
        else:
            sparse = None
            bs = 1
        if boxes is not None:
            be = self.embed_boxes(boxes)
            sparse = be if sparse is None else jnp.concatenate([sparse, be], axis=1)
            bs = be.shape[0]
        if sparse is None:
            sparse = jnp.zeros((bs, 0, self.embed_dim))
        dense = self.embed_masks(masks) if masks is not None else self.no_mask_dense(bs)
        return sparse, dense
