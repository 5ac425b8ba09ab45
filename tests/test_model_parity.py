"""Forward-pass numerical parity of the flax YOLOv10 against the torch
reference (reference weights converted via utils/torch_convert)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

from _oracle import reference_model, state_dict_numpy
from _helpers import build_jax


def _build_pair(scale: str):
    ref = reference_model(f"yolov10{scale}")
    model, spec, variables = build_jax(scale)
    return ref, model, spec, variables


@pytest.mark.parametrize("scale", ["n", "s"])
def test_param_count_matches_reference(scale):
    ref, model, spec, variables = _build_pair(scale)
    n_ref = sum(p.numel() for p in ref.parameters())
    # our DFL decode is parameter-free; reference counts its frozen 16-ch conv
    n_dfl = 16
    n_ours = sum(v.size for v in jax.tree.leaves(variables["params"]))
    assert n_ours + n_dfl == n_ref, (n_ours, n_ref)


@pytest.mark.parametrize("scale", ["n"])
def test_forward_parity(scale):
    import torch

    ref, model, spec, variables = _build_pair(scale)
    sd = state_dict_numpy(ref)
    sd = {k: v for k, v in sd.items() if "dfl" not in k}
    variables = convert_torch_state_dict(sd, variables)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 96, 3), dtype=np.float32) * 0.5 + 0.5

    # compare the training-mode raw head maps (covers every layer incl. head)
    ref.train()  # raw dict output
    # BatchNorm must stay in eval statistics mode for parity
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    from _helpers import apply_model

    out_j = apply_model(model, variables, jnp.asarray(x))

    for branch in ("one2many", "one2one"):
        for i, (a, b) in enumerate(zip(out_j[branch], out_t[branch])):
            a = np.asarray(a)  # NHWC
            b = b.detach().numpy().transpose(0, 2, 3, 1)
            err = np.abs(a - b).max()
            assert err < 2e-4, f"{branch}[{i}] max abs err {err}"
