"""SAM model assembly (reference: models/sam/build.py + modules/sam.py).

The Sam flax module wires image encoder + prompt encoder + mask decoder and
exposes jit-friendly methods (`encode_image`, `predict_masks`) invoked via
``model.apply(vars, ..., method=...)`` or through the Sam facade bound in
SAMPredictor.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoders import MaskDecoder
from .encoders import ImageEncoderViT, PromptEncoder

# ImageNet pixel stats used by SAM preprocessing (reference sam.py:42)
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


class Sam(nn.Module):
    """Segment Anything Model (reference modules/sam.py:18).

    `encoder_cfg=None` selects the ViT encoder with the given dims; MobileSAM's
    TinyViT plugs in via `tiny=True` (see tiny_encoder.py).
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = 1024
    prompt_embed_dim: int = 256
    tiny: bool = False
    tiny_embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    tiny_depths: Tuple[int, ...] = (2, 2, 6, 2)
    tiny_num_heads: Tuple[int, ...] = (2, 4, 5, 10)

    def setup(self):
        if self.tiny:
            from .tiny_encoder import TinyViT

            self.image_encoder = TinyViT(
                img_size=self.img_size,
                embed_dims=self.tiny_embed_dims,
                depths=self.tiny_depths,
                num_heads=self.tiny_num_heads,
                window_sizes=(7, 7, 14, 7),
            )
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size,
                embed_dim=self.embed_dim,
                depth=self.depth,
                num_heads=self.num_heads,
                global_attn_indexes=self.global_attn_indexes,
                out_chans=self.prompt_embed_dim,
            )
        emb = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            image_embedding_size=(emb, emb),
            input_image_size=(self.img_size, self.img_size),
            mask_in_chans=16,
        )
        self.mask_decoder = MaskDecoder(transformer_dim=self.prompt_embed_dim)

    def encode_image(self, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) normalized NHWC -> (B, H/16, W/16, 256)."""
        return self.image_encoder(x)

    def dense_pe(self) -> jax.Array:
        return self.prompt_encoder.get_dense_pe()

    def predict_masks(
        self,
        image_embeddings: jax.Array,
        points: Optional[Tuple[jax.Array, jax.Array]] = None,
        boxes: Optional[jax.Array] = None,
        masks: Optional[jax.Array] = None,
        multimask_output: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Prompt-conditioned mask prediction: returns
        (masks (B, M, H/4, W/4), iou_pred (B, M))."""
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes, masks=masks)
        return self.mask_decoder(
            image_embeddings,
            self.prompt_encoder.get_dense_pe(),
            sparse,
            dense,
            multimask_output=multimask_output,
        )

    def __call__(self, x: jax.Array, points: Tuple[jax.Array, jax.Array]):
        """Full forward for init/tracing: encode then decode point prompts."""
        emb = self.encode_image(x)
        return self.predict_masks(emb, points=points)

    def init_all(self, x: jax.Array):
        """Init entry exercising every prompt branch so all params exist
        (flax creates setup params lazily on first use)."""
        emb = self.encode_image(x)
        h, w = self.prompt_encoder.image_embedding_size
        return self.predict_masks(
            emb,
            points=(jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32)),
            boxes=jnp.zeros((1, 4)),
            masks=jnp.zeros((1, 4 * h, 4 * w, 1)),
        )


def build_sam_vit_h(img_size: int = 1024) -> Sam:
    """SAM ViT-H (reference build.py:21)."""
    return Sam(embed_dim=1280, depth=32, num_heads=16,
               global_attn_indexes=(7, 15, 23, 31), img_size=img_size)


def build_sam_vit_l(img_size: int = 1024) -> Sam:
    """SAM ViT-L (reference build.py:32)."""
    return Sam(embed_dim=1024, depth=24, num_heads=16,
               global_attn_indexes=(5, 11, 17, 23), img_size=img_size)


def build_sam_vit_b(img_size: int = 1024) -> Sam:
    """SAM ViT-B (reference build.py:43)."""
    return Sam(embed_dim=768, depth=12, num_heads=12,
               global_attn_indexes=(2, 5, 8, 11), img_size=img_size)


def build_mobile_sam(img_size: int = 1024) -> Sam:
    """MobileSAM with TinyViT encoder (reference build.py:54)."""
    return Sam(tiny=True, img_size=img_size)


SAM_MODEL_MAP = {
    "sam_h": build_sam_vit_h,
    "sam_l": build_sam_vit_l,
    "sam_b": build_sam_vit_b,
    "mobile_sam": build_mobile_sam,
}


def build_sam(name: str = "sam_b", img_size: int = 1024) -> Sam:
    """Build a SAM variant by name (reference build.py:149)."""
    key = str(name).replace(".pt", "").replace(".ckpt", "")
    for k, fn in SAM_MODEL_MAP.items():
        if key.endswith(k):
            return fn(img_size=img_size)
    raise FileNotFoundError(
        f"{name} is not a supported SAM model. Available: {list(SAM_MODEL_MAP)}"
    )
