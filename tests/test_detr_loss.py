"""RT-DETR loss: matcher optimality, loss finiteness, end-to-end grad."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.train.detr_loss import hungarian_match, rtdetr_loss


def test_matcher_picks_overlapping_queries():
    B, Q, M, C = 1, 8, 2, 3
    pred_boxes = np.tile(np.array([[0.1, 0.1, 0.05, 0.05]]), (Q, 1)).astype(np.float32)
    pred_boxes[3] = [0.5, 0.5, 0.2, 0.2]
    pred_boxes[6] = [0.8, 0.8, 0.1, 0.1]
    pred_scores = np.zeros((Q, C), np.float32)
    pred_scores[3, 1] = 4.0
    pred_scores[6, 2] = 4.0
    gt_boxes = np.array([[0.5, 0.5, 0.2, 0.2], [0.8, 0.8, 0.1, 0.1]], np.float32)
    gt_labels = np.array([1, 2], np.int32)
    matched = np.asarray(
        hungarian_match(
            jnp.asarray(pred_boxes[None]), jnp.asarray(pred_scores[None]),
            jnp.asarray(gt_boxes[None]), jnp.asarray(gt_labels[None]),
            jnp.ones((1, M), bool),
        )
    )
    assert matched[0, 0] == 3 and matched[0, 1] == 6


def test_rtdetr_loss_grad():
    from yolov10_3d_tpu.nn.build import build_model

    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/rt-detr/rtdetr-l.yaml", scale="l"
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    B, M = 1, 3
    batch = {
        "gt_labels": jnp.asarray(rng.integers(0, 80, (B, M)).astype(np.int32)),
        "gt_bboxes": jnp.asarray(
            np.concatenate(
                [rng.uniform(0.3, 0.7, (B, M, 2)), rng.uniform(0.1, 0.3, (B, M, 2))], -1
            ).astype(np.float32)
        ),
        "mask_gt": jnp.ones((B, M), bool),
    }

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        total, items = rtdetr_loss(preds, batch)
        return total

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    gn = sum(float(jnp.sum(g.astype(jnp.float32) ** 2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0
