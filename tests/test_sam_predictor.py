"""SAMPredictor functional tests: set_image + prompt inference + AMG on a
small random-weight Sam (behavior/shape checks; numerics are covered by
tests/test_sam_parity.py)."""

import numpy as np
import pytest

from yolov10_3d_tpu.models.sam import Sam, SAMPredictor, build_sam


@pytest.fixture(scope="module")
def predictor():
    import jax

    model = Sam(embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,),
                img_size=64, prompt_embed_dim=32)
    s = model.img_size
    import jax.numpy as jnp

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)),
                           method=Sam.init_all)
    )()
    p = SAMPredictor(model, variables)
    img = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    p.set_image(img)
    return p


def test_point_and_box_prompts(predictor):
    masks, scores = predictor.prompt_inference(points=[[20, 20], [40, 30], [10, 5]])
    assert masks.shape == (3, 16, 16) and scores.shape == (3,)

    masks, scores = predictor.prompt_inference(
        points=[[20, 20]], multimask_output=True
    )
    assert masks.shape == (3, 16, 16)  # 3 multimask outputs for 1 prompt

    masks, scores = predictor.prompt_inference(bboxes=[[5, 5, 40, 40], [0, 0, 20, 30]])
    assert masks.shape == (2, 16, 16)

    # low-res mask prompt (model.img_size/4 = 16)
    prev = np.zeros((1, 16, 16), np.float32)
    masks, scores = predictor.prompt_inference(points=[[20, 20]], masks=prev)
    assert masks.shape == (1, 16, 16)


def test_generate_everything(predictor):
    masks, scores, boxes = predictor.generate(
        points_stride=4, points_batch_size=8, conf_thres=-10.0,
        stability_score_thresh=-1.0,
    )
    assert masks.dtype == bool and masks.shape[1:] == (16, 16)
    assert len(masks) == len(scores) == len(boxes)
    assert len(masks) > 0  # thresholds disabled -> NMS survivors remain


def test_build_map():
    m = build_sam("sam_l", img_size=64)
    assert m.depth == 24 and m.embed_dim == 1024
    m = build_sam("mobile_sam", img_size=64)
    assert m.tiny
    with pytest.raises(FileNotFoundError):
        build_sam("sam_q")


def test_mobile_sam_end_to_end():
    import jax
    import jax.numpy as jnp

    model = build_sam("mobile_sam", img_size=64)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           method=Sam.init_all)
    )()
    p = SAMPredictor(model, variables)
    img = np.random.default_rng(1).uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    p.set_image(img)
    assert p.features.shape == (1, 4, 4, 256)
    masks, scores = p.prompt_inference(points=[[32, 32]], multimask_output=True)
    assert masks.shape == (3, 16, 16) and scores.shape == (3,)


def test_remove_small_regions():
    m = np.zeros((2, 32, 32), bool)
    m[0, 4:20, 4:20] = True
    m[0, 25, 25] = True  # 1px island
    m[1, 8:16, 8:16] = True
    m[1, 10:12, 10:12] = False  # 4px hole
    out, keep = SAMPredictor.remove_small_regions(m, min_area=8)
    assert not out[list(keep).index(0)][25, 25]  # island removed
    assert out[list(keep).index(1)][10, 10]  # hole filled


def test_mixed_point_box_prompts(predictor):
    """3 points + 3 boxes share one padded prompt batch (this combination
    crashed on the sparse-embedding concat; review finding)."""
    m, sc = predictor.prompt_inference(
        points=[[10, 10], [20, 20], [30, 30]],
        bboxes=[[5, 5, 30, 30], [10, 10, 40, 40], [15, 15, 50, 50]],
    )
    assert len(sc) == 3 and m.shape[0] == 3
