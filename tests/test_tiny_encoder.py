"""MobileSAM TinyViT parity vs the torch reference at full 1024 resolution
(the reference forward hardcodes the 64x64 final grid, so the real size is
also the only testable one)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._oracle import load_reference, state_dict_numpy
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

torch = pytest.importorskip("torch")


def test_tiny_vit_parity():
    load_reference()
    from ultralytics.models.sam.modules.tiny_encoder import TinyViT as TorchTinyViT

    from yolov10_3d_tpu.models.sam.tiny_encoder import TinyViT

    torch.manual_seed(0)
    tm = TorchTinyViT(
        img_size=1024, in_chans=3, embed_dims=[64, 128, 160, 320],
        depths=[2, 2, 6, 2], num_heads=[2, 4, 5, 10], window_sizes=[7, 7, 14, 7],
        mlp_ratio=4.0, drop_path_rate=0.0,
    ).eval()
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if "attention_biases" in n:  # zero-init; randomize to test the path
                p.copy_(torch.randn_like(p) * 0.1)
    tm.train(False)  # refresh the reference Attention's cached `ab` biases

    x = torch.randn(1, 3, 1024, 1024)
    with torch.no_grad():
        want = tm(x).numpy()  # (1, 256, 64, 64)

    jm = TinyViT()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = jax.jit(jm.init, static_argnames="train")(
        jax.random.PRNGKey(0), xj, train=False
    )
    sd = {
        k: v
        for k, v in state_dict_numpy(tm).items()
        if not k.startswith(("norm_head", "head"))  # classifier head omitted
    }
    variables = convert_torch_state_dict(sd, variables)
    got = np.asarray(
        jax.jit(lambda v: jm.apply(v, xj, train=False))(variables)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
