"""Space-to-depth stem rewrite: exact parity with the plain stride-2 stem.

The rewrite (ops/spd_stem.py) must be a pure graph transform: identical
parameter tree, outputs equal to f32 accumulation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yolov10_3d_tpu.ops.spd_stem import spd_stem_conv
from tests._helpers import CFG_DIR, build_jax


def test_spd_conv_matches_strided_conv():
    rng = np.random.default_rng(3)
    for H, W, C, O in [(64, 96, 3, 16), (32, 32, 5, 8)]:
        x = jnp.asarray(rng.normal(size=(2, H, W, C)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, C, O)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = spd_stem_conv(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_spd_stem_model_parity():
    """yolov10n with spd_stem=True: same param tree, same outputs."""
    from yolov10_3d_tpu.nn.build import build_model

    plain, spec, variables = build_jax("n")
    spd, _ = build_model(f"{CFG_DIR}/yolov10n.yaml", spd_stem=True)

    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32
    )

    # identical parameter trees (checkpoint compatibility)
    plain_paths = {"/".join(map(str, p)) for p, _ in
                   jax.tree_util.tree_flatten_with_path(variables)[0]}
    spd_vars = jax.jit(spd.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False
    )
    spd_paths = {"/".join(map(str, p)) for p, _ in
                 jax.tree_util.tree_flatten_with_path(spd_vars)[0]}
    assert plain_paths == spd_paths

    ref = jax.jit(lambda v: plain.apply(v, x, train=False))(variables)
    got = jax.jit(lambda v: spd.apply(v, x, train=False))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_spd_serving_predictor_parity(tmp_path):
    """Predictor(spd_serving=True): the preprocess stage emits the packed
    (B, H/2, W/2, 12) layout, the serving twin's stem consumes it, and
    detections are IDENTICAL to the default path (f32; the rewrite is an
    exact weight repack). Covers both the device-preprocess (uniform uint8)
    and host-letterbox (in-graph pack) branches."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from yolov10_3d_tpu.cfg import get_cfg
    from yolov10_3d_tpu.engine.predictor import Predictor
    from yolov10_3d_tpu.nn.build import build_model

    model, spec = build_model("yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml")
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)

    base = Predictor(
        model, spec, variables, get_cfg(None, {"spd_serving": False}), {0: "x"}
    )
    packed = Predictor(
        model, spec, variables, get_cfg(None, {"spd_serving": True}), {0: "x"}
    )
    assert packed._spd_packed and not base._spd_packed
    # packed is the DEFAULT serving config (round-5: it is exact and
    # measured faster, so it is no longer opt-in)
    assert Predictor(model, spec, variables, get_cfg(None, {}), {0: "x"})._spd_packed
    r0 = base(img, imgsz=64, conf=0.001, max_det=20)[0]
    r1 = packed(img, imgsz=64, conf=0.001, max_det=20)[0]
    np.testing.assert_allclose(r1.boxes.data, r0.boxes.data, rtol=1e-5, atol=1e-4)

    # host-letterbox branch (device_preprocess off -> in-graph pack)
    packed_host = Predictor(
        model, spec, variables,
        get_cfg(None, {"spd_serving": True, "device_preprocess": False}),
        {0: "x"},
    )
    r2 = packed_host(img, imgsz=64, conf=0.001, max_det=20)[0]
    np.testing.assert_allclose(r2.boxes.data, r0.boxes.data, rtol=1e-5, atol=1e-4)
