"""Pipeline parallelism over the SAM ViT encoder (parallel/pipeline.py):
S-stage ppermute pipeline == plain sequential forward, stage params sharded
over a pp mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov10_3d_tpu.models.sam.encoders import ImageEncoderViT
from yolov10_3d_tpu.parallel.pipeline import (
    get_mesh_pp, make_pp_encoder, prepare_pp_params, _stage_window_pattern,
)

# tiny ViT with the SAM layout: global-attn blocks at a fixed period so a
# stage count dividing the period yields homogeneous stages
ENC = dict(
    img_size=64, patch_size=16, embed_dim=32, depth=8, num_heads=2,
    mlp_ratio=2.0, out_chans=16, use_rel_pos=True, window_size=2,
    global_attn_indexes=(1, 3, 5, 7),
)


def _init(enc, B=4):
    x = jnp.zeros((B, enc.img_size, enc.img_size, 3), jnp.float32)
    v = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    return v


def test_stage_pattern_validation():
    enc = ImageEncoderViT(**ENC)
    assert _stage_window_pattern(enc, 4) == [2, 0]
    assert _stage_window_pattern(enc, 2) == [2, 0, 2, 0]
    with pytest.raises(ValueError, match="divisible"):
        _stage_window_pattern(enc, 3)
    bad = ImageEncoderViT(**{**ENC, "global_attn_indexes": (0, 3, 5, 7)})
    with pytest.raises(ValueError, match="pattern"):
        _stage_window_pattern(bad, 4)


@pytest.mark.parametrize("stages,micro", [(4, 4), (2, 2)])
def test_pp_matches_sequential(stages, micro):
    if len(jax.devices()) < stages:
        pytest.skip("needs virtual multi-device CPU")
    enc = ImageEncoderViT(**ENC)
    v = _init(enc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))

    ref = jax.jit(enc.apply)(v, x)

    mesh = get_mesh_pp(stages)
    stage_params, rest = prepare_pp_params(enc, v, mesh)
    # the pp value: each device holds depth/S of the block params
    leaf = jax.tree.leaves(stage_params[0])[0]
    assert leaf.shape[0] == stages
    assert len(leaf.sharding.device_set) == stages

    fn = make_pp_encoder(enc, mesh, n_microbatches=micro)
    got = fn(stage_params, rest, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pp_gradients_match_sequential():
    """The pipeline is trainable: grads through shard_map + ppermute + scan
    equal the sequential encoder's block grads (ppermute's VJP is the
    reverse permutation; scan transposes to the reverse-time scan)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    enc = ImageEncoderViT(**ENC)
    v = _init(enc)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))

    g_ref = jax.jit(jax.grad(lambda vv: enc.apply(vv, x).sum()))(v)["params"]

    mesh = get_mesh_pp(4)
    stage_params, rest = prepare_pp_params(enc, v, mesh)
    fn = make_pp_encoder(enc, mesh, n_microbatches=4)
    g_pp = jax.grad(lambda sp: fn(sp, rest, x).sum())(stage_params)

    S, k = 4, ENC["depth"] // 4
    for j in range(k):
        got_j = jax.tree.map(np.asarray, g_pp[j])
        for s in range(S):
            want = jax.tree.map(np.asarray, g_ref[f"blocks_{s * k + j}"])
            got = jax.tree.map(lambda a: a[s], got_j)
            flat_w = jax.tree_util.tree_leaves_with_path(want)
            flat_g = jax.tree_util.tree_leaves_with_path(got)
            for (pw, w), (pg, g) in zip(flat_w, flat_g):
                assert pw == pg
                np.testing.assert_allclose(g, w, rtol=5e-4, atol=5e-5,
                                           err_msg=f"stage {s} block {j} {pw}")


def test_pp_single_stage_degenerates():
    """S=1 mesh: the pipeline is just microbatched sequential execution."""
    enc = ImageEncoderViT(**ENC)
    v = _init(enc)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = jax.jit(enc.apply)(v, x)
    mesh = get_mesh_pp(1)
    stage_params, rest = prepare_pp_params(enc, v, mesh)
    fn = make_pp_encoder(enc, mesh, n_microbatches=2)
    got = fn(stage_params, rest, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
