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
    assert n_ours == n_ref, (n_ours, n_ref, n_ref - n_ours)


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


def test_rtdetr_forward_parity_with_converted_weights():
    """RT-DETR-l parity vs the reference with converted weights, staged to be
    independent of top-300 rank ties (on an untrained net the 300th/301st
    encoder scores differ by less than cross-framework conv noise, so the
    selected query SET is not deterministic — verified: given identical
    selections the rest of the pipeline matches to ~1e-6):
      1. backbone + AIFI + neck features entering the decoder: < 2e-4
      2. full decoder stack driven by the reference's exact (embed, refer):
         final (300, 84) output < 1e-5
    """
    import torch

    from _oracle import load_reference, state_dict_numpy
    from yolov10_3d_tpu.nn.rtdetr_head import RTDETRDecoder
    from yolov10_3d_tpu.nn.transformer import inverse_sigmoid
    from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

    load_reference()
    import yaml as _yaml
    from ultralytics.nn.tasks import RTDETRDetectionModel

    d = _yaml.safe_load(open("/root/reference/ultralytics/cfg/models/rt-detr/rtdetr-l.yaml"))
    d["scale"] = "l"
    d["yaml_file"] = "rtdetr-l.yaml"
    ref = RTDETRDetectionModel(d, verbose=False)
    ref.eval()

    model, spec = build_model("yolov10_3d_tpu/cfg/models/rt-detr/rtdetr-l.yaml", scale="l")
    x0 = jnp.zeros((1, 128, 128, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    variables = convert_torch_state_dict(state_dict_numpy(ref), variables)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 128, 160, 3)).astype(np.float32)
    caps = {}
    dec_t = ref.model[-1]
    orig = dec_t._get_decoder_input

    def cap(feats, shapes, a=None, b=None):
        out = orig(feats, shapes, a, b)
        caps["feats"] = feats.detach().numpy()
        caps["shapes"] = shapes
        caps["dec"] = [o.detach().numpy() for o in out]
        return out

    dec_t._get_decoder_input = cap
    with torch.no_grad():
        out_t = ref.predict(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    y_ref = (out_t[0] if isinstance(out_t, tuple) else out_t)[0].numpy()

    # stage 1: features entering the decoder (backbone + AIFI + neck + proj)
    out_j, state = model.apply(
        variables, jnp.asarray(img), train=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    inter = state["intermediates"]
    head = RTDETRDecoder(nc=80, ch=(256, 256, 256))
    hp = {
        "params": variables["params"]["model_28"],
        "batch_stats": variables["batch_stats"].get("model_28", {}),
    }
    m = head.bind(hp)
    xs = [np.asarray(inter[f"model_{i}"]["__call__"][0]) for i in (21, 24, 27)]
    feats_l = []
    for i, x in enumerate(xs):
        p = m.input_proj[i][1](m.input_proj[i][0](jnp.asarray(x)), use_running_average=True)
        feats_l.append(p.reshape(p.shape[0], -1, p.shape[-1]))
    feats_j = jnp.concatenate(feats_l, 1)
    assert np.abs(np.asarray(feats_j) - caps["feats"]).max() < 2e-4

    # stage 2: my decoder on the reference's exact decoder inputs
    emb_t, refer_t, _, _ = caps["dec"]
    shapes = tuple((int(h), int(w)) for h, w in caps["shapes"])
    e = jnp.asarray(emb_t)
    r = jax.nn.sigmoid(jnp.asarray(refer_t))
    for i, layer in enumerate(m.dec_layers):
        qp = m.query_pos_head(r)
        e = layer(e, r, jnp.asarray(caps["feats"]), shapes, query_pos=qp)
        b = m.dec_bbox_head[i](e)
        r = jax.nn.sigmoid(b + inverse_sigmoid(r))
    final = np.asarray(
        jnp.concatenate([r, jax.nn.sigmoid(m.dec_score_head[-1](e))], -1)
    )[0]
    assert final.shape == y_ref.shape
    assert np.abs(final - y_ref).max() < 1e-5
