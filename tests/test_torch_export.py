"""Reverse weight export: flax -> reference-compatible torch state_dict.

Key-exactness and value round-trip are pinned against the reference oracle:
oracle state_dict -> convert_torch_state_dict (forward) -> flax_to_torch_state_dict
(reverse) must reproduce EVERY oracle key (dotted names, OIHW layouts, BN
stats, num_batches_tracked, frozen DFL arange, v10Detect3d o2o_heads aliases)
with identical values. This is what makes tools/parity_run.py bidirectional:
a model trained here can hand weights back to the reference
(tasks.py:811 attempt_load_one_weight's state_dict equivalent)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolov10_3d_tpu.nn.build import build_model  # noqa: E402
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402
from yolov10_3d_tpu.utils.torch_export import (  # noqa: E402
    export_torch_checkpoint,
    flax_to_torch_state_dict,
)

from _oracle import reference_model, state_dict_numpy  # noqa: E402


def _roundtrip(cfg_name, yaml_path, hw=(64, 64), drop_o2o_alias=False):
    ref = reference_model(cfg_name)
    sd_ref = state_dict_numpy(ref)

    model, spec = build_model(yaml_path)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False
    )
    sd_in = {
        k: v
        for k, v in sd_ref.items()
        if "dfl" not in k
        and not (drop_o2o_alias and k.split(".", 2)[1].startswith("o2o_heads"))
    }
    variables = convert_torch_state_dict(sd_in, variables)
    sd_out = flax_to_torch_state_dict(variables)
    return sd_ref, sd_out


def _assert_exact(sd_ref, sd_out):
    missing = sorted(set(sd_ref) - set(sd_out))
    extra = sorted(set(sd_out) - set(sd_ref))
    assert not missing, f"missing {len(missing)} keys, first: {missing[:6]}"
    assert not extra, f"extra {len(extra)} keys, first: {extra[:6]}"
    for k, v in sd_ref.items():
        w = sd_out[k]
        assert tuple(w.shape) == tuple(v.shape), (k, w.shape, v.shape)
        if k.endswith("num_batches_tracked"):
            # value is torch-runtime bookkeeping (the oracle's build-time dry
            # forward ticks it to 1); only consulted under momentum=None
            continue
        np.testing.assert_allclose(
            np.asarray(w, np.float64), np.asarray(v, np.float64),
            rtol=0, atol=0, err_msg=k,
        )


def test_reverse_export_yolov10n():
    sd_ref, sd_out = _roundtrip(
        "yolov10n", "yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml"
    )
    _assert_exact(sd_ref, sd_out)


def test_reverse_export_yolov10n_3d():
    sd_ref, sd_out = _roundtrip(
        "yolov10n_3D",
        "yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml",
        hw=(96, 160),
        drop_o2o_alias=True,
    )
    _assert_exact(sd_ref, sd_out)


def test_export_torch_checkpoint_file(tmp_path):
    torch = pytest.importorskip("torch")
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = export_torch_checkpoint(
        str(tmp_path / "w.pt"),
        variables,
        model_yaml="yolov10n.yaml",
        names={0: "person"},
        train_args={"imgsz": 640},
    )
    ckpt = torch.load(p, map_location="cpu", weights_only=False)
    assert ckpt["model_yaml"] == "yolov10n.yaml"
    assert ckpt["names"] == {0: "person"}
    sd = ckpt["state_dict"]
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    # and the reference oracle model can strict-load it
    ref = reference_model("yolov10n")
    ref.load_state_dict({k: v for k, v in sd.items()}, strict=True)


def test_exported_pt_roundtrips_through_facade(tmp_path):
    """Our torch .pt loads back through Model/AutoBackend with identical
    forward outputs (train here -> .pt -> serve anywhere, incl. back here)."""
    pytest.importorskip("torch")
    from yolov10_3d_tpu.engine.model import Model

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = export_torch_checkpoint(
        str(tmp_path / "rt.pt"), variables,
        model_yaml="yolov10n.yaml", names={i: str(i) for i in range(80)},
    )
    m2 = Model(p)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)["one2one"]
    out = jax.jit(lambda v, x: m2.model.apply(v, x, train=False))(m2.variables, x)["one2one"]
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), rtol=1e-5, atol=1e-6)
