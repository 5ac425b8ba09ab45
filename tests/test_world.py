"""YOLO-World parity: full yolov8-worldv2 forward vs the reference WorldModel
with converted weights and identical text features, plus the v1 layout with
mid-network ImagePoolingAttn text refresh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._oracle import load_reference, state_dict_numpy
from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

torch = pytest.importorskip("torch")


def _build_ref(name, scale):
    load_reference()
    import yaml as _yaml

    from ultralytics.nn.tasks import WorldModel

    with open(f"/root/reference/ultralytics/cfg/models/v8/{name}.yaml") as f:
        d = _yaml.safe_load(f)
    d["scale"] = scale
    d["yaml_file"] = f"{name}.yaml"
    m = WorldModel(d, verbose=False)
    m.eval()
    return m


@pytest.mark.parametrize("name", ["yolov8-worldv2", "yolov8-world"])
def test_world_forward_parity(name):
    ref = _build_ref(name, "n")
    torch.manual_seed(0)
    txt = torch.randn(1, 80, 512)
    ref.txt_feats = txt
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want, feats = ref(x)  # eval: (y, x) from WorldDetect

    model, spec = build_model(
        f"yolov10_3d_tpu/cfg/models/v8/{name}.yaml", scale="n"
    )
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    tj = jnp.asarray(txt.numpy())
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), xj, train=False, txt_feats=tj
    )
    variables = convert_torch_state_dict(state_dict_numpy(ref), variables)
    maps = jax.jit(
        lambda v: model.apply(v, xj, train=False, txt_feats=tj)
    )(variables)

    # compare the raw per-scale maps (torch feats list, BCHW)
    for got, ref_map in zip(maps, feats):
        # the contrastive logit scale exp(log(1/0.07)) ~= 14.3 amplifies f32
        # accumulation noise on the class channels
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref_map.numpy(),
            rtol=2e-3, atol=5e-3,
        )


def test_world_decode():
    """Decoded world detections go through the standard v8 decode+NMS path."""
    from yolov10_3d_tpu.ops.postprocess import v8_detections

    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/v8/yolov8-worldv2.yaml", scale="n", nc=4
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32)
    txt = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 512)), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False, txt_feats=txt
    )
    maps = jax.jit(lambda v: model.apply(v, x, train=False, txt_feats=txt))(variables)
    det = v8_detections(maps, spec.strides, spec.nc, max_det=10)
    assert det["boxes"].shape == (1, 10, 4)
