"""Forward parity of v8 task models (seg/pose/obb/cls/detect) vs the torch
reference with converted weights."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

from _oracle import load_reference, state_dict_numpy

CFG = "yolov10_3d_tpu/cfg/models/v8"
REF_CFG = "/root/reference/ultralytics/cfg/models/v8"


def _pair(ref_cls_name, yaml_name, scale="n"):
    import torch

    load_reference()
    from ultralytics.nn import tasks

    ref_cls = getattr(tasks, ref_cls_name)
    import yaml as _yaml

    d = _yaml.safe_load(open(f"{REF_CFG}/{yaml_name}.yaml"))
    d["scale"] = scale
    d["yaml_file"] = f"{yaml_name}.yaml"
    ref = ref_cls(d, verbose=False)
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()

    model, spec = build_model(f"{CFG}/{yaml_name}.yaml", scale=scale)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    sd = {k: v for k, v in state_dict_numpy(ref).items() if "dfl" not in k}
    variables = convert_torch_state_dict(sd, variables)
    return ref, model, spec, variables


def _fwd(ref, model, variables, hw=(64, 96)):
    import torch

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, hw[0], hw[1], 3)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x)
    )
    return out_t, out_j


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_segment_parity():
    ref, model, spec, variables = _pair("SegmentationModel", "yolov8-seg")
    out_t, out_j = _fwd(ref, model, variables)
    det_t, mc_t, p_t = out_t
    for a, b in zip(out_j["det"], det_t):
        assert np.abs(np.asarray(a) - _to_nhwc(b)).max() < 3e-4
    # torch mc: (B, nm, A) concat of flattened scales
    mc_j = np.concatenate(
        [np.asarray(m).reshape(m.shape[0], -1, m.shape[-1]) for m in out_j["mask_coefs"]],
        axis=1,
    ).transpose(0, 2, 1)
    assert np.abs(mc_j - mc_t.numpy()).max() < 3e-4
    assert np.abs(np.asarray(out_j["protos"]) - _to_nhwc(p_t)).max() < 3e-4


def test_pose_parity():
    ref, model, spec, variables = _pair("PoseModel", "yolov8-pose")
    out_t, out_j = _fwd(ref, model, variables)
    det_t, kpt_t = out_t
    for a, b in zip(out_j["det"], det_t):
        assert np.abs(np.asarray(a) - _to_nhwc(b)).max() < 3e-4
    kpt_j = np.concatenate(
        [np.asarray(k).reshape(k.shape[0], -1, k.shape[-1]) for k in out_j["kpts"]],
        axis=1,
    ).transpose(0, 2, 1)
    assert np.abs(kpt_j - kpt_t.numpy()).max() < 3e-4


def test_obb_parity():
    ref, model, spec, variables = _pair("OBBModel", "yolov8-obb")
    out_t, out_j = _fwd(ref, model, variables)
    det_t, angle_t = out_t
    for a, b in zip(out_j["det"], det_t):
        assert np.abs(np.asarray(a) - _to_nhwc(b)).max() < 3e-4
    # torch angle output is already (sigmoid - 0.25) * pi
    ang_j = np.concatenate(
        [np.asarray(k).reshape(k.shape[0], -1, k.shape[-1]) for k in out_j["angle"]],
        axis=1,
    ).transpose(0, 2, 1)
    ang_j = (1 / (1 + np.exp(-ang_j)) - 0.25) * math.pi
    assert np.abs(ang_j - angle_t.numpy()).max() < 3e-4


def test_classify_parity():
    import torch

    ref, model, spec, variables = _pair("ClassificationModel", "yolov8-cls")
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        logits_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    logits_j = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x)
    )
    assert np.abs(np.asarray(logits_j) - logits_t.numpy()).max() < 3e-4


def test_v5_v6_v3_build_and_run():
    for cfg in ("v5/yolov5.yaml", "v6/yolov6.yaml", "v3/yolov3.yaml"):
        model, spec = build_model(f"yolov10_3d_tpu/cfg/models/{cfg}", scale="n")
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False
        )
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        assert len(out) == 3  # three detection scales


def test_yolov9c_forward_parity():
    """yolov9 family: RepNCSPELAN4/ADown/SPPELAN modules vs reference."""
    import torch
    import yaml as _yaml

    load_reference()
    from ultralytics.nn.tasks import DetectionModel

    d = _yaml.safe_load(open("/root/reference/ultralytics/cfg/models/v9/yolov9c.yaml"))
    d["yaml_file"] = "yolov9c.yaml"
    ref = DetectionModel(d, verbose=False)
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v9/yolov9c.yaml")
    assert spec.strides == (8, 16, 32)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    sd = {k: v for k, v in state_dict_numpy(ref).items() if "dfl" not in k}
    variables = convert_torch_state_dict(sd, variables)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out_j = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(img)
    )
    for a, b in zip(out_j, out_t):
        assert np.abs(np.asarray(a) - b.detach().numpy().transpose(0, 2, 3, 1)).max() < 3e-4
