"""RT-DETR decoder head (reference: head.py:275 ``RTDETRDecoder``).

Inference path: project multi-scale features, anchor-based top-300 query
selection from the encoder score head, 6 deformable decoder layers with
iterative box refinement, returns (B, 300, 4 + nc) xywh-normalized boxes +
sigmoid scores. Training-time contrastive denoising groups (get_cdn_group)
are deferred — the head exposes enc/dec outputs for a detr-style loss.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import TorchBatchNorm
from .transformer import (
    MLP, DeformableTransformerDecoderLayer, inverse_sigmoid,
)


DEFAULT_NUM_DENOISING = 100  # reference head.py:300 nd


class RTDETRDecoder(nn.Module):
    nc: int = 80
    ch: Tuple[int, ...] = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    nd: int = DEFAULT_NUM_DENOISING  # num denoising queries (reference head.py:300)
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0

    def setup(self):
        self.denoising_class_embed = nn.Embed(self.nc, self.hd)
        nl = len(self.ch)
        # torch input_proj.{i}: Sequential(Conv2d no-bias, BN) -> names
        # input_proj_{i}_{0,1}
        self.input_proj = [
            [
                nn.Conv(self.hd, (1, 1), use_bias=False, padding="VALID"),
                # trains like every other BN (mutable batch_stats path);
                # eps/momentum follow the reference's initialize_weights,
                # which forces 1e-3/0.03 on ALL BatchNorm2d (torch_utils.py:333)
                TorchBatchNorm(momentum=0.97, epsilon=1e-3),
            ]
            for _ in self.ch
        ]
        self.dec_layers = [
            DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, nl, self.ndp, name=f"decoder_layers_{i}"
            )
            for i in range(self.ndl)
        ]
        self.query_pos_head = MLP(2 * self.hd, self.hd, 2)
        self.enc_output = [nn.Dense(self.hd), nn.LayerNorm(epsilon=1e-5)]
        self.enc_score_head = nn.Dense(self.nc)
        self.enc_bbox_head = MLP(self.hd, 4, 3)
        self.dec_score_head = [nn.Dense(self.nc) for _ in range(self.ndl)]
        self.dec_bbox_head = [MLP(self.hd, 4, 3) for _ in range(self.ndl)]

    @staticmethod
    def _anchors(shapes, grid_size: float = 0.05, eps: float = 1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            xy = jnp.stack([gx, gy], -1).reshape(-1, 2)
            wh = jnp.full_like(xy, grid_size * (2.0**i))
            anchors.append(jnp.concatenate([xy, wh], -1))
        a = jnp.concatenate(anchors, 0)[None]  # (1, A, 4)
        valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)
        a = jnp.log(a / (1 - a))
        a = jnp.where(valid, a, jnp.inf)
        return a, valid

    def __call__(
        self,
        xs: Sequence[jax.Array],
        train: bool = False,
        dn_embed: Optional[jax.Array] = None,  # (B, D, hd) CDN queries
        dn_bbox: Optional[jax.Array] = None,  # (B, D, 4) logit boxes
        dn_attn_mask: Optional[jax.Array] = None,  # (D+nq, D+nq) bool
        gt_cls: Optional[jax.Array] = None,  # (B, M): build CDN internally
        gt_bboxes: Optional[jax.Array] = None,  # (B, M, 4) xywh normalized
        gt_mask: Optional[jax.Array] = None,  # (B, M)
        dn_rng: Optional[jax.Array] = None,
    ) -> Dict:
        if self.is_initializing():
            _ = self.denoising_class_embed.embedding  # materialize the param
        if train and gt_cls is not None and dn_embed is None:
            # build contrastive denoising groups from GT with the head's own
            # class embedding (reference head.py:372-377 get_cdn_group)
            from ..train.cdn import get_cdn_group

            dn_embed, dn_bbox, dn_attn_mask, _ = get_cdn_group(
                gt_cls, gt_bboxes, gt_mask, self.nc, self.nq,
                self.denoising_class_embed.embedding,
                dn_rng if dn_rng is not None else jax.random.PRNGKey(0),
                num_dn=self.nd,
                cls_noise_ratio=self.label_noise_ratio,
                box_noise_scale=self.box_noise_scale,
            )
        feats_l = []
        shapes = []
        for i, x in enumerate(xs):
            p = self.input_proj[i][1](
                self.input_proj[i][0](x), use_running_average=not train
            )
            B, H, W, C = p.shape
            feats_l.append(p.reshape(B, H * W, C))
            shapes.append((H, W))
        feats = jnp.concatenate(feats_l, 1).astype(jnp.float32)
        B = feats.shape[0]

        anchors, valid = self._anchors(shapes)
        f = self.enc_output[1](self.enc_output[0](jnp.where(valid, feats, 0.0)))
        enc_scores = self.enc_score_head(f)  # (B, A, nc)
        # clamp to the anchor count so small probe images still trace (the
        # parameter tree is independent of the query count)
        _, topk_ind = jax.lax.top_k(enc_scores.max(-1), min(self.nq, enc_scores.shape[1]))
        top_feat = jnp.take_along_axis(f, topk_ind[..., None], axis=1)
        top_anchor = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (B,) + anchors.shape[1:]), topk_ind[..., None], axis=1
        )
        refer = self.enc_bbox_head(top_feat) + top_anchor
        enc_bboxes = jax.nn.sigmoid(refer)
        enc_topk_scores = jnp.take_along_axis(enc_scores, topk_ind[..., None], axis=1)

        embed = top_feat
        if train:
            embed = jax.lax.stop_gradient(embed)
            refer = jax.lax.stop_gradient(refer)

        # prepend contrastive denoising queries (reference head.py:386:
        # torch.cat([dn_embed, embed], 1) when training with CDN)
        if dn_embed is not None:
            embed = jnp.concatenate([dn_embed, embed], axis=1)
            refer = jnp.concatenate([dn_bbox, refer], axis=1)

        refer_s = jax.nn.sigmoid(refer)
        dec_bboxes = []
        dec_scores = []
        last_refined = None
        out_b = out_s = None
        for i, layer in enumerate(self.dec_layers):
            qpos = self.query_pos_head(refer_s)
            embed = layer(
                embed, refer_s, feats, tuple(shapes),
                attn_mask=dn_attn_mask, query_pos=qpos,
            )
            bbox = self.dec_bbox_head[i](embed)
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer_s))
            if train:
                dec_scores.append(self.dec_score_head[i](embed))
                dec_bboxes.append(
                    refined if i == 0
                    else jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined))
                )
                refer_s = jax.lax.stop_gradient(refined)
            else:
                out_b, out_s = refined, self.dec_score_head[i](embed)
                refer_s = refined
            last_refined = refined

        if train:
            return {
                "dec_bboxes": jnp.stack(dec_bboxes),
                "dec_scores": jnp.stack(dec_scores),
                "enc_bboxes": enc_bboxes,
                "enc_scores": enc_topk_scores,
            }
        return {"pred": jnp.concatenate([out_b, jax.nn.sigmoid(out_s)], -1)}
