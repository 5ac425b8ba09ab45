"""Fixed-shape JAX NMS vs reference non_max_suppression."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.ops.nms import nms_numpy, non_max_suppression

from _oracle import load_reference


def test_nms_matches_reference():
    import torch

    load_reference()
    from ultralytics.utils.ops import non_max_suppression as ref_nms

    rng = np.random.default_rng(0)
    B, A, nc = 2, 128, 5
    cxy = rng.uniform(50, 200, (B, A, 2))
    wh = rng.uniform(10, 60, (B, A, 2))
    scores = rng.uniform(0, 1, (B, A, nc)) ** 3  # sparse high scores
    preds = np.concatenate([cxy, wh, scores], -1).astype(np.float32)

    # reference expects (B, 4+nc, A); pass a copy — it mutates in place
    ref_out = ref_nms(
        torch.from_numpy(preds.transpose(0, 2, 1).copy()), conf_thres=0.4,
        iou_thres=0.5, max_det=50,
    )
    boxes, out_scores, labels, valid = jax.jit(
        lambda p: non_max_suppression(p, conf_thres=0.4, iou_thres=0.5, max_det=50)
    )(jnp.asarray(preds))

    for b in range(B):
        r = ref_out[b].numpy()  # (n, 6) xyxy conf cls
        n = int(np.asarray(valid[b]).sum())
        assert n == len(r), (n, len(r))
        ours = np.concatenate(
            [np.asarray(boxes[b][:n]), np.asarray(out_scores[b][:n, None]),
             np.asarray(labels[b][:n, None])], -1,
        )
        # same set of detections (order may differ on ties)
        r_sorted = r[np.lexsort(r.T)]
        o_sorted = ours[np.lexsort(ours.T)]
        np.testing.assert_allclose(o_sorted, r_sorted, atol=1e-3)


def test_nms_numpy_basic():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_numpy(boxes, scores, iou_thres=0.5)
    assert list(keep) == [0, 2]
