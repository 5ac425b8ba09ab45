#!/usr/bin/env python
"""In-step attribution of the dual-loss cost (VERDICT r3 perf campaign).

exp_bwd_ablate measured: model fwd+bwd 190.9 ms, +dual loss = 266.6 ms
(loss adds 75.7 ms in-step at B=128 — 2.7x its isolated cost). This tool
times grad(model + <loss slice>) for cumulative slices to find where those
75.7 ms live when the loss is fused into the step:

  assign-only  : + both assigners (stop-grad; pure fwd cost)
  +cls         : + BCE term (grad through pred_scores)
  +box         : + CIoU term (grad through pred_bboxes)
  +dfl         : + DFL term (grad through pred_dist_bins)
  full         : the real v10 dual loss
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from _bench_util import timed  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.ops.boxes import (  # noqa: E402
    bbox2dist, bbox_iou, dist2bbox, make_anchors, xywh2xyxy,
)
from yolov10_3d_tpu.ops.postprocess import flatten_feats  # noqa: E402
from yolov10_3d_tpu.nn.modules import dfl_decode  # noqa: E402
from yolov10_3d_tpu.train.loss import REG_MAX, _bce_logits, _df_loss  # noqa: E402
from yolov10_3d_tpu.train.tal import assign  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HW = 640


def branch_loss(feats, batch, nc, strides, topk, terms):
    x, shapes = flatten_feats(feats)
    x = x.astype(jnp.float32)
    Bs, A, _ = x.shape
    pred_distri, pred_scores = x[..., : REG_MAX * 4], x[..., REG_MAX * 4 :]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)
    imgsz_h = shapes[0][0] * strides[0]
    imgsz_w = shapes[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["gt_bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask_gt"]
    gt_bboxes = gt_bboxes * mask_gt[..., None]
    pred_dist_bins = pred_distri.reshape(Bs, A, 4, REG_MAX)
    pred_dist = dfl_decode(pred_distri, REG_MAX)
    pred_bboxes = dist2bbox(pred_dist, anchor_points[None], xywh=False)
    res = assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        batch["gt_labels"], gt_bboxes, mask_gt,
        topk=topk, num_classes=nc,
    )
    total = jnp.zeros((), jnp.float32)
    tss = jnp.maximum(res.target_scores.sum(), 1.0)
    if "cls" in terms:
        total += _bce_logits(pred_scores, res.target_scores).sum() / tss
    if "box" in terms:
        fg = res.fg_mask
        weight = res.target_scores.sum(-1) * fg
        tb = res.target_bboxes / stride_tensor[None]
        iou = bbox_iou(pred_bboxes, tb, xywh=False, ciou=True)[..., 0]
        total += (((1.0 - iou) * weight) * fg).sum() / tss
    if "dfl" in terms:
        fg = res.fg_mask
        weight = res.target_scores.sum(-1) * fg
        tb = res.target_bboxes / stride_tensor[None]
        tl = bbox2dist(anchor_points[None], tb, REG_MAX - 1)
        d = _df_loss(pred_dist_bins, tl)[..., 0]
        total += ((d * weight) * fg).sum() / tss
    if not terms:
        total += res.target_scores.sum() * 0.0  # keep assigner live
    return total


def main():
    model, spec = build_model(
        "/root/repo/yolov10_3d_tpu/cfg/models/v10/yolov10s.yaml"
    )
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    params, bs = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    M = 20
    xywh = np.stack(
        [
            rng.uniform(0.2, 0.8, (B, M)), rng.uniform(0.2, 0.8, (B, M)),
            rng.uniform(0.05, 0.3, (B, M)), rng.uniform(0.05, 0.3, (B, M)),
        ],
        -1,
    ).astype(np.float32)
    batch = {
        "img": img,
        "gt_labels": jnp.asarray(rng.integers(0, spec.nc, (B, M)), jnp.int32),
        "gt_bboxes": jnp.asarray(xywh),
        "mask_gt": jnp.ones((B, M), bool),
    }

    def gn(g):
        return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in jax.tree.leaves(g))

    def make(terms, dual=True):
        @jax.jit
        def g(params, batch):
            def f(p):
                preds, _ = model.apply(
                    {"params": p, "batch_stats": bs}, batch["img"], train=True,
                    mutable=["batch_stats"],
                )
                t = branch_loss(
                    preds["one2many"], batch, spec.nc, spec.strides, 10, terms
                )
                if dual:
                    t += branch_loss(
                        preds["one2one"], batch, spec.nc, spec.strides, 1, terms
                    )
                return t + sum(
                    l.astype(jnp.float32).sum() * 0.0
                    for l in jax.tree.leaves(preds)
                )

            return gn(jax.grad(f)(params))

        return g

    base = make((), dual=False)

    # model-only baseline (loss slices measured as deltas from this)
    @jax.jit
    def g0(params, batch):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": bs}, batch["img"], train=True,
                mutable=["batch_stats"],
            )
            return sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(preds))

        return gn(jax.grad(f)(params))

    t0 = timed(g0, params, batch)
    print(f"B={B} grad model only          : {t0*1e3:7.1f} ms", flush=True)
    t_as1 = timed(base, params, batch)
    print(f"B={B} + o2m assigner only      : {t_as1*1e3:7.1f} ms (+{(t_as1-t0)*1e3:.1f})", flush=True)
    t_as = timed(make(()), params, batch)
    print(f"B={B} + both assigners         : {t_as*1e3:7.1f} ms (+{(t_as-t_as1)*1e3:.1f})", flush=True)
    prev = t_as
    for terms in (("cls",), ("cls", "box"), ("cls", "box", "dfl")):
        t = timed(make(terms), params, batch)
        print(
            f"B={B} + {'+'.join(terms):17s}     : {t*1e3:7.1f} ms (+{(t-prev)*1e3:.1f})",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
