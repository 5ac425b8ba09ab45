"""Parity of decode/postprocess/IoU ops against the torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.ops import boxes as B
from yolov10_3d_tpu.ops.postprocess import decode_detect, v10_postprocess
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

from _oracle import reference_model, state_dict_numpy


def test_ciou_parity():
    import torch
    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.metrics import bbox_iou as ref_iou

    rng = np.random.default_rng(1)
    b1 = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    b2 = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    # make xyxy well-formed
    b1[:, 2:] = b1[:, :2] + np.abs(b1[:, 2:] - b1[:, :2])
    b2[:, 2:] = b2[:, :2] + np.abs(b2[:, 2:] - b2[:, :2])
    ref = ref_iou(torch.from_numpy(b1), torch.from_numpy(b2), xywh=False, CIoU=True).numpy()
    ours = np.asarray(B.bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, ciou=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_decode_and_postprocess_parity():
    import torch
    from _oracle import load_reference

    load_reference()
    from ultralytics.utils import ops as ref_ops

    from _helpers import build_jax

    ref = reference_model("yolov10n")
    model, spec, variables = build_jax("n")
    sd = {k: v for k, v in state_dict_numpy(ref).items() if "dfl" not in k}
    variables = convert_torch_state_dict(sd, variables)

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (2, 96, 64, 3)).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        out = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    y_ref = out["one2one"][0]  # (B, 4+nc, A) xywh + scores

    from _helpers import apply_model

    feats = apply_model(model, variables, jnp.asarray(img))["one2one"]
    preds = jax.jit(decode_detect, static_argnames=("strides", "nc"))(
        feats, tuple(spec.strides), spec.nc
    )  # (B, A, 4+nc) xyxy

    ref_np = y_ref.numpy().transpose(0, 2, 1)  # (B, A, 4+nc)
    ref_xyxy = np.asarray(B.xywh2xyxy(jnp.asarray(ref_np[..., :4])))
    np.testing.assert_allclose(np.asarray(preds[..., :4]), ref_xyxy, atol=2e-3)
    np.testing.assert_allclose(np.asarray(preds[..., 4:]), ref_np[..., 4:], atol=1e-4)

    # top-k postprocess parity — synthetic tie-free scores (an untrained net
    # saturates sigmoid to exactly 1.0, and torch/XLA order ties differently)
    max_det = 30
    synth = rng.uniform(0, 1, ref_np.shape).astype(np.float32)
    rb, rs, rl = ref_ops.v10postprocess(torch.from_numpy(synth), max_det, 80)
    ob, os_, ol = v10_postprocess(jnp.asarray(synth), max_det, 80)
    np.testing.assert_allclose(np.asarray(os_), rs.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ol), rl.numpy())
    np.testing.assert_allclose(np.asarray(ob), rb.numpy(), atol=1e-6)


def test_make_anchors_parity():
    import torch
    from _oracle import load_reference

    load_reference()
    from ultralytics.utils.tal import make_anchors as ref_make_anchors

    feats = [torch.zeros(1, 3, 8, 12), torch.zeros(1, 3, 4, 6), torch.zeros(1, 3, 2, 3)]
    ref_pts, ref_str = ref_make_anchors(feats, [8, 16, 32], 0.5)
    pts, strs = B.make_anchors([(8, 12), (4, 6), (2, 3)], [8, 16, 32], 0.5)
    np.testing.assert_allclose(np.asarray(pts), ref_pts.numpy())
    np.testing.assert_allclose(np.asarray(strs), ref_str.numpy())
