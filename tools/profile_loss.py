#!/usr/bin/env python
"""Micro-profile the v10 dual loss internals on the chip: assigner, CIoU,
topk, BCE, DFL — find the 200 ms."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.devices()

from yolov10_3d_tpu.ops.boxes import bbox_iou, make_anchors
from yolov10_3d_tpu.train.loss import v10_detect_loss, detection_loss
from yolov10_3d_tpu.train.tal import assign, _topk_mask

import sys
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
M, C = 20, 80
shapes = [(80, 80), (40, 40), (20, 20)]
A = sum(h * w for h, w in shapes)
strides = (8, 16, 32)


from _bench_util import timed as _timed, gnorm  # noqa: E402


def timed(fn, *args, iters=8):
    return _timed(fn, *args, iters=iters) * 1e3


def main():
    rng = np.random.default_rng(0)
    pd_scores = jnp.asarray(rng.uniform(0, 1, (B, A, C)).astype(np.float32))
    pd_bboxes = jnp.asarray(rng.uniform(0, 640, (B, A, 4)).astype(np.float32))
    anc = jnp.asarray(rng.uniform(0, 640, (A, 2)).astype(np.float32))
    gt_labels = jnp.asarray(rng.integers(0, C, (B, M)), jnp.int32)
    gt_bboxes = jnp.asarray(
        np.sort(rng.uniform(0, 640, (B, M, 4)).astype(np.float32), -1)
    )
    mask_gt = jnp.ones((B, M), bool)

    t_assign = timed(
        jax.jit(lambda *a: assign(*a, topk=10, num_classes=C).target_scores.sum()),
        pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt,
    )
    t_ciou = timed(
        jax.jit(lambda g, p: bbox_iou(g[:, :, None], p[:, None], xywh=False, ciou=True).sum()),
        gt_bboxes, pd_bboxes,
    )
    metrics = jnp.asarray(rng.uniform(0, 1, (B, M, A)).astype(np.float32))
    t_topk = timed(
        jax.jit(lambda m, v: _topk_mask(m, 10, v).sum()), metrics, mask_gt
    )
    t_lax_topk = timed(jax.jit(lambda m: jax.lax.top_k(m, 10)[0].sum()), metrics)
    onehot_idx = jnp.asarray(rng.integers(0, A, (B, M, 10)), jnp.int32)
    t_onehot = timed(
        jax.jit(lambda i: jax.nn.one_hot(i, A, dtype=jnp.int32).sum(-2).sum()), onehot_idx
    )

    # full dual loss on fake head outputs
    feats_om = [jnp.asarray(rng.uniform(-1, 1, (B, h, w, 64 + C)).astype(np.float32)) for h, w in shapes]
    feats_oo = [jnp.asarray(rng.uniform(-1, 1, (B, h, w, 64 + C)).astype(np.float32)) for h, w in shapes]
    batch = {
        "gt_labels": gt_labels,
        "gt_bboxes": jnp.asarray(
            np.stack([rng.uniform(0.3, 0.7, (B, M)), rng.uniform(0.3, 0.7, (B, M)),
                      rng.uniform(0.05, 0.2, (B, M)), rng.uniform(0.05, 0.2, (B, M))], -1).astype(np.float32)),
        "mask_gt": mask_gt,
    }
    t_loss = timed(
        jax.jit(lambda fm, fo, b: v10_detect_loss({"one2many": fm, "one2one": fo}, b,
                                                  nc=C, strides=strides,
                                                  gains=(7.5, 0.5, 1.5), one2many_topk=10)[0]),
        feats_om, feats_oo, batch,
    )
    t_loss_grad = timed(
        jax.jit(lambda fm, fo, b: gnorm(jax.grad(
            lambda f2, f3: v10_detect_loss({"one2many": f2, "one2one": f3}, b,
                                           nc=C, strides=strides,
                                           gains=(7.5, 0.5, 1.5), one2many_topk=10)[0],
            argnums=(0, 1))(fm, fo))),
        feats_om, feats_oo, batch,
    )
    t_assign1 = timed(
        jax.jit(lambda *a: assign(*a, topk=1, num_classes=C).target_scores.sum()),
        pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt,
    )
    t_v8 = timed(
        jax.jit(lambda fm, b: detection_loss(fm, b, nc=C, strides=strides,
                                                gains=(7.5, 0.5, 1.5), tal_topk=10)[0]),
        feats_om, batch,
    )

    print(f"A={A} B={B} M={M}")
    print(f"assign (topk=10):        {t_assign:7.1f} ms")
    print(f"  CIoU (B,M,A):          {t_ciou:7.1f} ms")
    print(f"  _topk_mask:            {t_topk:7.1f} ms")
    print(f"    lax.top_k only:      {t_lax_topk:7.1f} ms")
    print(f"    one_hot count only:  {t_onehot:7.1f} ms")
    print(f"assign (topk=1):         {t_assign1:7.1f} ms")
    print(f"v8 single loss:          {t_v8:7.1f} ms")
    print(f"v10 dual loss:           {t_loss:7.1f} ms")
    print(f"v10 dual loss fwd+bwd:   {t_loss_grad:7.1f} ms")


if __name__ == "__main__":
    main()


def pieces():
    """Bisect detection_loss internals."""
    import numpy as np
    from yolov10_3d_tpu.nn.modules import dfl_decode
    from yolov10_3d_tpu.ops.boxes import bbox2dist, dist2bbox
    from yolov10_3d_tpu.train.loss import _bce_logits, _df_loss, detection_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.uniform(-3, 3, (B, A, C)).astype(np.float32))
    targets = jnp.asarray(rng.uniform(0, 1, (B, A, C)).astype(np.float32))
    t_bce = timed(jax.jit(lambda l, t: _bce_logits(l, t).sum()), logits, targets)

    distri = jnp.asarray(rng.uniform(-2, 2, (B, A, 4, 16)).astype(np.float32))
    ltrb = jnp.asarray(rng.uniform(0, 14.9, (B, A, 4)).astype(np.float32))
    t_dfl = timed(jax.jit(lambda d, t: _df_loss(d, t).sum()), distri, ltrb)

    flat = distri.reshape(B, A, 64)
    anc = jnp.asarray(rng.uniform(0, 80, (A, 2)).astype(np.float32))
    t_dec = timed(
        jax.jit(lambda d: dist2bbox(dfl_decode(d, 16), anc[None], xywh=False).sum()), flat
    )

    feats = [jnp.asarray(rng.uniform(-1, 1, (B, h, w, 64 + C)).astype(np.float32)) for h, w in shapes]
    batch = {
        "gt_labels": jnp.asarray(rng.integers(0, C, (B, M)), jnp.int32),
        "gt_bboxes": jnp.asarray(
            np.stack([rng.uniform(0.3, 0.7, (B, M)), rng.uniform(0.3, 0.7, (B, M)),
                      rng.uniform(0.05, 0.2, (B, M)), rng.uniform(0.05, 0.2, (B, M))], -1).astype(np.float32)),
        "mask_gt": jnp.ones((B, M), bool),
    }
    t_topk1 = timed(
        jax.jit(lambda fm, b: detection_loss(fm, b, nc=C, strides=strides,
                                             gains=(7.5, 0.5, 1.5), tal_topk=1)[0]),
        feats, batch,
    )
    print(f"BCE (B,A,{C}):           {t_bce:7.1f} ms")
    print(f"_df_loss (B,A,4,16):     {t_dfl:7.1f} ms")
    print(f"dfl_decode+dist2bbox:    {t_dec:7.1f} ms")
    print(f"detection_loss topk=1:   {t_topk1:7.1f} ms")


if __name__ == "__main__":
    pieces()
