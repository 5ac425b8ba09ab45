"""RT-DETR contrastive denoising groups: parity vs reference get_cdn_group
(deterministic noise injected on both sides) + end-to-end trainability."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._oracle import load_reference
from yolov10_3d_tpu.train.cdn import cdn_attn_mask, get_cdn_group

torch = pytest.importorskip("torch")


def test_cdn_group_parity(monkeypatch):
    load_reference()
    from ultralytics.models.utils.ops import get_cdn_group as torch_cdn

    rng = np.random.default_rng(0)
    n, nc, hd, nq, num_dn = 3, 8, 16, 10, 7
    G = num_dn // n  # 2 groups
    D = 2 * G * n
    gt_cls = rng.integers(0, nc, n)
    gt_box = rng.uniform(0.2, 0.6, (n, 4)).astype(np.float32)  # xywh in (0,1)
    class_embed = rng.normal(size=(nc, hd)).astype(np.float32)

    R_flip = rng.uniform(size=D).astype(np.float32)
    R_part = rng.uniform(size=(D, 4)).astype(np.float32)
    NEW_LABEL = 5

    # deterministic torch noise
    real_rand = torch.rand
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.tensor(R_flip)
                        if tuple(s[0] if isinstance(s[0], torch.Size) else s) == (D,)
                        else real_rand(*s, **k))
    monkeypatch.setattr(torch, "rand_like", lambda t, **k: torch.tensor(R_part))
    monkeypatch.setattr(
        torch, "randint_like",
        lambda t, lo, hi, **k: (torch.full_like(t, NEW_LABEL, **k) if hi > 2
                                else torch.ones_like(t)),
    )

    batch = {
        "cls": torch.tensor(gt_cls, dtype=torch.long),
        "bboxes": torch.tensor(gt_box),
        "batch_idx": torch.zeros(n, dtype=torch.long),
        "gt_groups": [n],
    }
    want_cls, want_box, want_mask, meta = torch_cdn(
        batch, nc, nq, torch.tensor(class_embed), num_dn=num_dn, training=True
    )

    noise = {
        "flip": jnp.asarray(R_flip[None] < 0.25),  # cls_noise_ratio 0.5 * 0.5
        "new_label": jnp.full((1, D), NEW_LABEL, jnp.int32),
        "sign": jnp.ones((1, D, 4)),
        "part": jnp.asarray(R_part[None]),
    }
    got_emb, got_box, got_mask, got_meta = get_cdn_group(
        jnp.asarray(gt_cls[None]), jnp.asarray(gt_box[None]),
        jnp.ones((1, n), bool), nc, nq, jnp.asarray(class_embed),
        jax.random.PRNGKey(0), num_dn=num_dn, _noise=noise,
    )
    assert got_meta["dn_num_group"] == meta["dn_num_group"] == G
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask.numpy())
    np.testing.assert_allclose(np.asarray(got_emb), want_cls.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_box), want_box.numpy(), rtol=1e-4, atol=1e-4)


def test_cdn_attn_mask_blocks():
    m = cdn_attn_mask(max_nums=2, num_group=2, num_queries=3)
    D = 8
    assert m.shape == (11, 11)
    assert m[D:, :D].all()  # matching queries blind to dn
    assert not m[D:, D:].any()  # matching sees itself
    assert m[0, 4:D].all() and not m[0, :4].any()  # group pair isolation


def test_cdn_end_to_end_train():
    """Full train step: cdn group -> head with dn kwargs -> dn loss grads."""
    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.train.detr_loss import rtdetr_loss

    model, spec = build_model(
        "yolov10_3d_tpu/cfg/models/rt-detr/rtdetr-l.yaml", nc=8
    )
    B, M, nc = 2, 4, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(B, 160, 160, 3)), jnp.float32)  # A >= 300
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=True
    )
    gt_cls = jnp.asarray(rng.integers(0, nc, (B, M)), jnp.int32)
    gt_box = jnp.asarray(rng.uniform(0.2, 0.6, (B, M, 4)), jnp.float32)
    gt_mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], bool)

    def loss_fn(params):
        variables_p = {**variables, "params": params}
        # class_embed for cdn: reference uses denoising_class_embed weights;
        # zeros-free random projection of the label space works for the test
        class_embed = jnp.asarray(rng.normal(size=(nc, 256)), jnp.float32)
        dn_embed, dn_bbox, dn_mask, meta = get_cdn_group(
            gt_cls, gt_box, gt_mask, nc, 300, class_embed,
            jax.random.PRNGKey(1), num_dn=8,
        )
        preds, _ = model.apply(
            variables_p, x, train=True,
            head_kwargs={"dn_embed": dn_embed, "dn_bbox": dn_bbox,
                         "dn_attn_mask": dn_mask},
            mutable=["batch_stats"],
        )
        batch = {"gt_bboxes": gt_box, "gt_labels": gt_cls, "mask_gt": gt_mask}
        total, items = rtdetr_loss(preds, batch, dn_meta=meta)
        return total, items

    (total, items), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(variables["params"])
    assert np.isfinite(float(total))
    assert float(items["loss_class_dn"]) > 0
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
