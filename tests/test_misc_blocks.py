"""Parity for the long tail of reference blocks: Ghost/CSP/cross-conv/
transformer/attention/ResNet modules with converted random weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests._oracle import load_reference, state_dict_numpy
from yolov10_3d_tpu.utils.torch_convert import convert_torch_state_dict

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def _ref():
    return load_reference()


def _check(tmod, jmod, x_torch, rtol=1e-3, atol=5e-4, train_kw=True):
    # deployed reference models get BN eps=1e-3/momentum=0.03 via
    # initialize_weights (torch_utils.py:327) — bare modules default to the
    # torch 1e-5; apply the reference init so both sides use the real config
    from ultralytics.utils.torch_utils import initialize_weights

    initialize_weights(tmod)
    tmod.eval()
    with torch.no_grad():
        want = tmod(x_torch).numpy()
    xj = jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 1))
    kw = {"train": False} if train_kw else {}
    variables = jax.jit(lambda: jmod.init(jax.random.PRNGKey(0), xj, **kw))()
    variables = convert_torch_state_dict(state_dict_numpy(tmod), variables)
    got = np.asarray(jmod.apply(variables, xj, **kw)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_ghost_and_csp_blocks():
    from ultralytics.nn.modules import (
        C1 as TC1, C3Ghost as TC3Ghost, C3x as TC3x, BottleneckCSP as TCSP,
        GhostConv as TGhost,
    )
    from ultralytics.nn.modules.block import GhostBottleneck as TGB

    import yolov10_3d_tpu.nn.modules as M

    torch.manual_seed(0)
    x = torch.randn(2, 8, 16, 16)
    _check(TGhost(8, 12, 3, 1), M.GhostConv(12, 3, 1), x)
    _check(TGB(8, 8, 3, 1), M.GhostBottleneck(8, 3, 1), x)
    _check(TGB(8, 12, 3, 2), M.GhostBottleneck(12, 3, 2), x)
    _check(TC1(8, 10, 2), M.C1(10, 2), x)
    _check(TC3x(8, 10, 2), M.C3x(10, 2), x)
    # C3Ghost hidden dims must keep ghost halves even (GhostConv outputs
    # 2*(c2//2), so odd c2 breaks the reference itself)
    _check(TC3Ghost(8, 16, 2), M.C3Ghost(16, 2), x)
    _check(TCSP(8, 10, 2), M.BottleneckCSP(10, 2), x)


def test_resnet_and_convtranspose():
    from ultralytics.nn.modules.block import ResNetLayer as TRL
    from ultralytics.nn.modules.conv import ConvTranspose as TCT

    import yolov10_3d_tpu.nn.modules as M

    torch.manual_seed(1)
    x = torch.randn(1, 8, 16, 16)
    _check(TRL(8, 4, 1, False, 2), M.ResNetLayer(4, 1, False, 2), x)
    _check(TRL(8, 8, 1, True), M.ResNetLayer(8, 1, True), x)
    _check(TCT(8, 6, 2, 2), M.ConvTransposeBlock(6, 2, 2), x)


def test_cbam():
    from ultralytics.nn.modules.conv import CBAM as TCBAM

    import yolov10_3d_tpu.nn.modules as M

    torch.manual_seed(2)
    x = torch.randn(2, 8, 12, 12)
    t = TCBAM(8, 7).eval()
    with torch.no_grad():
        want = t(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    jm = M.CBAM(7)
    v = jax.jit(lambda: jm.init(jax.random.PRNGKey(0), xj))()
    v = convert_torch_state_dict(state_dict_numpy(t), v)
    got = np.asarray(jm.apply(v, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_c3tr_transformer_block():
    from ultralytics.nn.modules.block import C3TR as TC3TR

    import yolov10_3d_tpu.nn.modules as M

    torch.manual_seed(3)
    x = torch.randn(2, 8, 8, 8)
    _check(TC3TR(8, 16, 2), M.C3TR(16, 2), x, rtol=5e-4, atol=5e-4)
