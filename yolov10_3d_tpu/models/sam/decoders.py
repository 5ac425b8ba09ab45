"""SAM mask decoder (reference: models/sam/modules/decoders.py).

NHWC image embeddings; hypernetwork mask synthesis as one einsum. The
multimask/single-mask selection is a static flag (slice under jit).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .transformer import TwoWayTransformer


class MLP(nn.Module):
    """Stacked Dense with ReLU between layers (reference decoders.py:154)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class MaskDecoder(nn.Module):
    """Transformer mask decoder with IoU quality head
    (reference decoders.py:12)."""

    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (1 or B, h, w, C) NHWC
        image_pe: jax.Array,  # (1, h, w, C)
        sparse_prompt_embeddings: jax.Array,  # (B, N, C)
        dense_prompt_embeddings: jax.Array,  # (B, h, w, C)
        multimask_output: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (masks (B, M, 4h, 4w), iou_pred (B, M))."""
        d = self.transformer_dim
        B = sparse_prompt_embeddings.shape[0]

        iou_token = nn.Embed(1, d, name="iou_token")
        mask_tokens = nn.Embed(self.num_mask_tokens, d, name="mask_tokens")
        output_tokens = jnp.concatenate(
            [iou_token.embedding, mask_tokens.embedding], axis=0
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (B, *output_tokens.shape)),
             sparse_prompt_embeddings],
            axis=1,
        )

        # per-mask batch: repeat image data to match prompt batch
        # (reference decoders.py:128 repeat_interleave)
        if image_embeddings.shape[0] != B:
            image_embeddings = jnp.broadcast_to(
                image_embeddings, (B, *image_embeddings.shape[1:])
            )
        src = image_embeddings + dense_prompt_embeddings
        _, h, w, _ = src.shape
        pos = jnp.broadcast_to(image_pe, (B, h, w, d))

        hs, src = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=d,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            name="transformer",
        )(src.reshape(B, h * w, d), pos.reshape(B, h * w, d), tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]

        # upscale 4x via two stride-2 transposed convs (reference decoders.py:60)
        src = src.reshape(B, h, w, d)
        x = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), padding="VALID", transpose_kernel=True,
            name="output_upscaling_0",
        )(src)
        x = nn.LayerNorm(epsilon=1e-6, name="output_upscaling_1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(
            d // 8, (2, 2), strides=(2, 2), padding="VALID", transpose_kernel=True,
            name="output_upscaling_3",
        )(x)
        upscaled = nn.gelu(x, approximate=False)  # (B, 4h, 4w, d/8)

        hyper_in = jnp.stack(
            [
                MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, d/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, upscaled)
        iou_pred = MLP(
            self.iou_head_hidden_dim,
            self.num_mask_tokens,
            self.iou_head_depth,
            name="iou_prediction_head",
        )(iou_token_out)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]
