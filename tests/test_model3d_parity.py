"""Forward parity of the flax yolov10s_3D model vs the torch reference."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.ops.postprocess import decode_detect3d
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

from _oracle import reference_model, state_dict_numpy


def test_forward3d_parity():
    import torch

    ref = reference_model("yolov10s_3D")
    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10-3D/yolov10s_3D.yaml")
    x0 = jnp.zeros((1, 96, 160, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )

    sd = state_dict_numpy(ref)
    # drop the aliased o2o_heads.* duplicates of cls/o2d/... and frozen buffers
    sd = {
        k: v
        for k, v in sd.items()
        if "dfl" not in k and not k.split(".", 2)[1].startswith("o2o_heads")
    }
    variables = convert_torch_state_dict(sd, variables)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 96, 160, 3)).astype(np.float32)

    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    with torch.no_grad():
        out_t = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    out_j = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(img)
    )

    for branch in ("one2many", "one2one"):
        ref_maps = out_t[branch][0] if isinstance(out_t[branch], tuple) else out_t[branch]
        for i, (a, b) in enumerate(zip(out_j[branch], ref_maps)):
            a = np.asarray(a)
            b = b.detach().numpy().transpose(0, 2, 3, 1)
            err = np.abs(a - b).max()
            assert err < 5e-4, f"{branch}[{i}] max err {err}"

    # depth-embedding exposure (head.py:745): shapes match reference embs
    embs_t = out_t["o2m_embs"]
    for a, b in zip(out_j["o2m_embs"], embs_t):
        assert a.shape == tuple(b.shape[i] for i in (0, 2, 3, 1))
