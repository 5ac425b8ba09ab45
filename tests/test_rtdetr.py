"""RT-DETR: structural param parity vs reference + functional forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov10_3d_tpu.nn.build import build_model


@pytest.fixture(scope="module")
def rtdetr():
    model, spec = build_model("yolov10_3d_tpu/cfg/models/rt-detr/rtdetr-l.yaml", scale="l")
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    return model, spec, variables


def test_rtdetr_param_count_vs_reference(rtdetr):
    from _oracle import load_reference

    load_reference()
    import yaml as _yaml
    from ultralytics.nn.tasks import RTDETRDetectionModel

    d = _yaml.safe_load(open("/root/reference/ultralytics/cfg/models/rt-detr/rtdetr-l.yaml"))
    d["scale"] = "l"
    d["yaml_file"] = "rtdetr-l.yaml"
    ref = RTDETRDetectionModel(d, verbose=False)
    n_ref = sum(p.numel() for p in ref.parameters())
    model, spec, variables = rtdetr
    n_ours = sum(v.size for v in jax.tree.leaves(variables["params"]))
    # we do not carry the training-only denoising class embedding (nc * 256)
    dn_embed = 80 * 256
    assert n_ours + dn_embed == n_ref, (n_ours, n_ref, n_ref - n_ours)


def test_rtdetr_forward(rtdetr):
    model, spec, variables = rtdetr
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    pred = np.asarray(out["pred"])
    assert pred.shape == (2, 300, 84)
    # boxes normalized, scores in (0, 1)
    assert pred[..., :4].min() >= 0 and pred[..., :4].max() <= 1
    assert pred[..., 4:].min() >= 0 and pred[..., 4:].max() <= 1
    # train-mode outputs for the detr-style loss
    out_t, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out_t["dec_bboxes"].shape == (6, 2, 300, 4)


def test_bilinear_sample_matches_grid_sample():
    import torch
    import torch.nn.functional as F

    from yolov10_3d_tpu.nn.transformer import bilinear_sample

    rng = np.random.default_rng(3)
    v = rng.standard_normal((2, 8, 12, 4)).astype(np.float32)
    g = rng.uniform(-1.2, 1.2, (2, 37, 2)).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(v), jnp.asarray(g)))
    ref = F.grid_sample(
        torch.from_numpy(v.transpose(0, 3, 1, 2)),
        torch.from_numpy(g[:, :, None, :]),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
