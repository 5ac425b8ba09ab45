"""Sparse top-k patch inference for the 3D head (reference head.py:663-716
``select_candidates``/``extract_patches``/``inference_forward_feat``).

The TPU redesign (heads3d.py ``_sparse_forward_feat``) must match the dense
forward at every candidate location (same values up to f32 accumulation
order), produce zeros off-candidate exactly like the reference's
``torch.zeros`` scatter target, and yield identical final detections through
the shared decode + top-k epilogue.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov10_3d_tpu.nn.build import build_model
from yolov10_3d_tpu.ops.postprocess import decode_detect3d, v10_3d_postprocess

CFG = "yolov10_3d_tpu/cfg/models/v10-3D/yolov10n_3D.yaml"
# crossover: a scale runs sparse iff 2*K*k2^2 < H*W (patch path must beat
# dense by ~2x in FLOPs to cover its gather/scatter overhead, measured in
# tools/exp_sparse_profile.py). P3 16x76=1216 > 900 -> true sparse selection
# (zeros off-candidate); P4 304 and P5 76 -> dense fallback (all real)
HW = (128, 608)


@pytest.fixture(scope="module")
def outputs():
    dense, spec = build_model(CFG, fast_eval=True)
    sparse, _ = build_model(CFG, fast_eval=True, sparse_eval=True)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, *HW, 3)), jnp.float32
    )
    v = jax.jit(dense.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=True
    )
    outd = jax.jit(lambda v, x: dense.apply(v, x, train=False))(v, x)
    outs = jax.jit(lambda v, x: sparse.apply(v, x, train=False))(v, x)
    return spec, outd["one2one"], outs["one2one"]


def test_param_tree_identical():
    """sparse_eval must not change the parameter tree (same checkpoints)."""
    dense, _ = build_model(CFG, fast_eval=True)
    sparse, _ = build_model(CFG, fast_eval=True, sparse_eval=True)
    x = jnp.zeros((1, *HW, 3), jnp.float32)
    vd = jax.eval_shape(
        lambda: dense.init(jax.random.PRNGKey(0), x, train=True)
    )
    vs = jax.eval_shape(
        lambda: sparse.init(jax.random.PRNGKey(0), x, train=True)
    )
    assert jax.tree_util.tree_structure(vd) == jax.tree_util.tree_structure(vs)
    for a, b in zip(jax.tree_util.tree_leaves(vd), jax.tree_util.tree_leaves(vs)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_values_match_dense_at_candidates(outputs):
    spec, fd, fs = outputs
    nc = spec.nc
    saw_partial = saw_full = False
    for a, b in zip(fd, fs):
        a, b = np.asarray(a), np.asarray(b)
        # the cls branch runs dense in both paths
        np.testing.assert_array_equal(a[..., :nc], b[..., :nc])
        cand = np.abs(b[..., nc:]).sum(-1) > 0
        frac = cand.mean()
        saw_partial |= frac < 0.999
        saw_full |= frac == 1.0
        # candidate locations: equal up to f32 reassociation (im2col matmul
        # tiling + BN folded to a*x+b differ from the dense conv's order)
        diff = np.abs(a[..., nc:] - b[..., nc:])[cand]
        assert diff.max() < 2e-3, diff.max()
    assert saw_partial and saw_full  # both regimes exercised (see HW note)


def test_detections_identical(outputs):
    """Global top-k can only pick per-scale top-k anchors (monotone max-class
    score), so sparse and dense postprocess to the same detections."""
    spec, fd, fs = outputs
    pd = decode_detect3d(fd, spec.strides, spec.nc)
    ps = decode_detect3d(fs, spec.strides, spec.nc)
    ra, sa, la = v10_3d_postprocess(pd, 50, spec.nc)
    rb, sb, lb = v10_3d_postprocess(ps, 50, spec.nc)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    assert np.abs(np.asarray(ra) - np.asarray(rb)).max() < 5e-3


def test_border_candidates_match_dense():
    """Dense conv2 zero-pads the conv1 OUTPUT map; the patch path must zero
    its out-of-map interior positions to match (border anchors diverged
    ~3e-3 before the in-map mask; interior float noise is ~1e-6). Content is
    isolated at a corner so the top-k candidates sit ON the border."""
    dense, spec = build_model(CFG, fast_eval=True)
    sparse, _ = build_model(CFG, fast_eval=True, sparse_eval=True)
    x = np.zeros((1, *HW, 3), np.float32)
    x[:, :10, :10] = np.random.default_rng(7).uniform(size=(1, 10, 10, 3))
    x = jnp.asarray(x)
    v = jax.jit(dense.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=True
    )
    fd = jax.jit(lambda v, x: dense.apply(v, x, train=False))(v, x)["one2one"]
    fs = jax.jit(lambda v, x: sparse.apply(v, x, train=False))(v, x)["one2one"]
    nc = spec.nc
    a, b = np.asarray(fd[0]), np.asarray(fs[0])  # P3: the sparse scale
    cand = np.abs(b[..., nc:]).sum(-1) > 0
    assert cand[0, 0, 0], "corner content must make the corner a candidate"
    border = np.zeros_like(cand)
    border[:, [0, -1], :] = border[:, :, [0, -1]] = True
    bc = cand & border
    assert bc.any()
    diff = np.abs(a[..., nc:] - b[..., nc:])[bc]
    assert diff.max() < 1e-4, diff.max()


def test_int8_mode_disables_fused_sparse():
    """_Int8Conv declares the same conv/kernel param tree, so structure
    checks pass — but its forward quantizes; the fused sparse path must not
    silently compute unquantized math (it falls back to dense)."""
    from yolov10_3d_tpu.nn import modules as m

    sparse, spec = build_model(CFG, fast_eval=True, sparse_eval=True)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(size=(1, *HW, 3)), jnp.float32
    )
    v = jax.jit(sparse.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=True
    )
    m.set_int8_mode(True)
    try:
        dense_i8, _ = build_model(CFG, fast_eval=True)
        v8 = jax.jit(dense_i8.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=True
        )
        outd = jax.jit(lambda v, x: dense_i8.apply(v, x, train=False))(v8, x)
        outs = jax.jit(lambda v, x: sparse.apply(v, x, train=False))(v8, x)
        for a, b in zip(outd["one2one"], outs["one2one"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        m.set_int8_mode(False)


def test_facades_respect_sparse_candidate_envelope():
    """Decode max_det above the head's per-scale candidate count (SPARSE_K)
    could select anchors whose sparse regression is zero; the predictor must
    only enable sparse_eval inside the envelope."""
    from yolov10_3d_tpu.cfg import get_cfg
    from yolov10_3d_tpu.engine.predictor import Predictor

    model, spec = build_model(CFG)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    p_in = Predictor(model, spec, v, get_cfg(overrides={"max_det": 50}))
    p_out = Predictor(model, spec, v, get_cfg(overrides={"max_det": 100}))
    assert p_in.model.sparse_eval and not p_out.model.sparse_eval
    assert p_out.model.fast_eval  # o2m still skipped outside the envelope


def test_envelope_fallback_predecessors():
    """Configs outside the sparse envelope (predecessor chaining needs dense
    neighbor outputs, mirroring the reference's unsupported cases) silently
    run the dense path: outputs are exactly the dense forward's."""
    import yaml as _yaml

    cfg = _yaml.safe_load(open(CFG))
    cfg["use_predecessors"] = True
    dense, spec = build_model(cfg, scale="n", fast_eval=True)
    sparse, _ = build_model(
        dict(cfg, **{}), scale="n", fast_eval=True, sparse_eval=True
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(1, *HW, 3)), jnp.float32
    )
    v = jax.jit(dense.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=True
    )
    outd = jax.jit(lambda v, x: dense.apply(v, x, train=False))(v, x)
    outs = jax.jit(lambda v, x: sparse.apply(v, x, train=False))(v, x)
    for a, b in zip(outd["one2one"], outs["one2one"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
