"""SAM module parity vs the torch reference (models/sam/modules/*).

Small configs, random weights converted via convert_torch_state_dict; the
torch rel-pos tables are randomized (they zero-init) so the decomposed
relative-position path is actually exercised.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._oracle import load_reference, state_dict_numpy
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _to_jax_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_image_encoder_vit_parity(ref):
    from functools import partial

    from ultralytics.models.sam.modules.encoders import ImageEncoderViT as TorchViT

    from yolov10_3d_tpu.models.sam.encoders import ImageEncoderViT

    torch.manual_seed(0)
    tenc = TorchViT(
        img_size=96, patch_size=16, embed_dim=64, depth=3, num_heads=2,
        out_chans=32, qkv_bias=True, use_rel_pos=True, window_size=4,
        global_attn_indexes=[1], norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    with torch.no_grad():
        # rel_pos zero-inits; randomize so the rel-pos path is tested
        for n, p in tenc.named_parameters():
            if "rel_pos" in n or "pos_embed" in n:
                p.copy_(torch.randn_like(p) * 0.02)

    x = torch.randn(2, 3, 96, 96)
    with torch.no_grad():
        want = tenc(x).numpy()  # (B, 32, 6, 6)

    jenc = ImageEncoderViT(
        img_size=96, embed_dim=64, depth=3, num_heads=2, out_chans=32,
        window_size=4, global_attn_indexes=(1,),
    )
    xj = _to_jax_nhwc(x)
    variables = jax.jit(jenc.init)(jax.random.PRNGKey(0), xj)
    variables = convert_torch_state_dict(state_dict_numpy(tenc), variables)
    got = np.asarray(jax.jit(jenc.apply)(variables, xj))  # NHWC
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4)


def test_prompt_encoder_parity(ref):
    from ultralytics.models.sam.modules.encoders import PromptEncoder as TorchPE

    from yolov10_3d_tpu.models.sam.encoders import PromptEncoder

    torch.manual_seed(1)
    tpe = TorchPE(embed_dim=64, image_embedding_size=(8, 8),
                  input_image_size=(128, 128), mask_in_chans=16).eval()

    jpe = PromptEncoder(embed_dim=64, image_embedding_size=(8, 8),
                        input_image_size=(128, 128), mask_in_chans=16)
    pts = jnp.zeros((2, 3, 2)), jnp.zeros((2, 3), jnp.int32)
    variables = jax.jit(jpe.init)(
        jax.random.PRNGKey(0), points=pts, boxes=jnp.zeros((2, 4)),
        masks=jnp.zeros((2, 32, 32, 1)),
    )
    variables = convert_torch_state_dict(state_dict_numpy(tpe), variables)

    # dense grid PE
    want_pe = tpe.get_dense_pe().detach().numpy()  # (1, 64, 8, 8)
    got_pe = np.asarray(jpe.apply(variables, method=PromptEncoder.get_dense_pe))
    np.testing.assert_allclose(got_pe.transpose(0, 3, 1, 2), want_pe, rtol=1e-5, atol=1e-5)

    # points only (torch pads with a -1 label point)
    coords = torch.tensor([[[10.0, 20.0], [100.0, 40.0]], [[5.0, 5.0], [64.0, 90.0]]])
    labels = torch.tensor([[1, 0], [1, -1]])
    sp_t, dn_t = tpe(points=(coords, labels), boxes=None, masks=None)
    sp_j, dn_j = jpe.apply(
        variables,
        points=(jnp.asarray(coords.numpy()), jnp.asarray(labels.numpy())),
    )
    np.testing.assert_allclose(np.asarray(sp_j), sp_t.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dn_j).transpose(0, 3, 1, 2), dn_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )

    # boxes + masks
    boxes = torch.tensor([[4.0, 6.0, 80.0, 90.0], [0.0, 0.0, 32.0, 32.0]])
    m = torch.randn(2, 1, 32, 32)
    sp_t, dn_t = tpe(points=None, boxes=boxes, masks=m)
    sp_j, dn_j = jpe.apply(
        variables,
        boxes=jnp.asarray(boxes.numpy()),
        masks=jnp.asarray(m.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(sp_j), sp_t.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dn_j).transpose(0, 3, 1, 2), dn_t.detach().numpy(), rtol=1e-4, atol=1e-4
    )


def test_mask_decoder_parity(ref):
    from ultralytics.models.sam.modules.decoders import MaskDecoder as TorchDec
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer as TorchTwoWay

    from yolov10_3d_tpu.models.sam.decoders import MaskDecoder

    torch.manual_seed(2)
    tdec = TorchDec(
        transformer_dim=64,
        transformer=TorchTwoWay(depth=2, embedding_dim=64, mlp_dim=256, num_heads=4),
        num_multimask_outputs=3,
    ).eval()

    emb = torch.randn(1, 64, 8, 8)
    pe = torch.randn(1, 64, 8, 8)
    sparse = torch.randn(2, 3, 64)
    dense = torch.randn(2, 64, 8, 8)
    with torch.no_grad():
        want_m, want_iou = tdec(emb, pe, sparse, dense, multimask_output=True)

    jdec = MaskDecoder(transformer_dim=64, transformer_mlp_dim=256, transformer_num_heads=4)
    args = (
        _to_jax_nhwc(emb),
        _to_jax_nhwc(pe),
        jnp.asarray(sparse.numpy()),
        _to_jax_nhwc(dense),
    )
    variables = jax.jit(lambda: jdec.init(jax.random.PRNGKey(0), *args))()
    variables = convert_torch_state_dict(state_dict_numpy(tdec), variables)
    got_m, got_iou = jax.jit(lambda v: jdec.apply(v, *args))(variables)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), rtol=2e-4, atol=2e-4)

    with torch.no_grad():
        want_m1, want_iou1 = tdec(emb, pe, sparse, dense, multimask_output=False)
    got_m1, got_iou1 = jax.jit(
        lambda v: jdec.apply(v, *args, multimask_output=False)
    )(variables)
    np.testing.assert_allclose(np.asarray(got_m1), want_m1.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_iou1), want_iou1.numpy(), rtol=2e-4, atol=2e-4)
