"""Classification augmentation pipeline (reference data/augment.py:1011-1149
classify_transforms / classify_augmentations; wired per dataset.py:268-283).
All ops run on PIL/numpy with an explicit np.random.Generator."""

import numpy as np
import pytest

from yolov10_3d_tpu.data.classify_aug import (
    _apply_op,
    _ra_space,
    _to_pil,
    augmix,
    auto_augment_imagenet,
    classify_train_augment,
    classify_val_transform,
    color_jitter,
    rand_augment,
    random_erasing,
    random_resized_crop,
)


def _textured(h=80, w=120):
    # limited range so AutoContrast/Equalize are guaranteed non-identity
    rng = np.random.default_rng(3)
    return rng.integers(30, 220, (h, w, 3), np.uint8)


def test_val_transform_shape_and_center():
    # 100x200: shortest edge -> 64 => (64, 128); center crop keeps the
    # left/right color split at the output's center column
    img = np.zeros((100, 200, 3), np.uint8)
    img[:, :100] = (255, 0, 0)
    img[:, 100:] = (0, 0, 255)
    out = classify_val_transform(img, 64, crop_fraction=1.0)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert tuple(out[32, 2]) == (255, 0, 0)
    assert tuple(out[32, -3]) == (0, 0, 255)
    # crop_fraction < 1 resizes the shortest edge LARGER then crops tighter
    out2 = classify_val_transform(img, 64, crop_fraction=0.5)
    assert out2.shape == (64, 64, 3)


def test_random_resized_crop_full_scale_is_resize():
    from PIL import Image

    img = _textured(90, 90)
    rng = np.random.default_rng(0)
    out = random_resized_crop(img, 64, rng, scale=(1.0, 1.0), ratio=(1.0, 1.0))
    ref = np.asarray(_to_pil(img).resize((64, 64), Image.BILINEAR))
    np.testing.assert_array_equal(out, ref)


def test_random_resized_crop_deterministic():
    img = _textured()
    a = random_resized_crop(img, 48, np.random.default_rng(5))
    b = random_resized_crop(img, 48, np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48, 48, 3)


def test_every_randaugment_op_applies():
    img = _textured(64, 64)
    pil = _to_pil(img)
    for name, mags, _signed in _ra_space(64, 64):
        mag = float(mags[9]) if mags is not None else 0.0
        out = np.asarray(_apply_op(pil, name, mag))
        assert out.shape == img.shape and out.dtype == np.uint8
        if name != "Identity":
            assert not np.array_equal(out, img), f"{name} was a no-op"


def test_policies_run_and_are_deterministic():
    img = _textured(72, 72)
    for fn in (rand_augment, auto_augment_imagenet, augmix):
        a = fn(img, np.random.default_rng(11))
        b = fn(img, np.random.default_rng(11))
        np.testing.assert_array_equal(a, b)
        assert a.shape == img.shape and a.dtype == np.uint8


def test_color_jitter_bounds():
    img = _textured()
    out = color_jitter(img, np.random.default_rng(2), 0.015, 0.7, 0.4)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)
    # zero gains = identity
    np.testing.assert_array_equal(
        color_jitter(img, np.random.default_rng(2), 0.0, 0.0, 0.0), img
    )


def test_random_erasing():
    img = np.full((60, 60, 3), 200, np.uint8)
    out = random_erasing(img, np.random.default_rng(4), p=1.0)
    zeros = (out == 0).all(-1).sum()
    # torchvision bounds: 2-33% of the area
    assert 0.02 * 3600 * 0.5 <= zeros <= 0.33 * 3600 * 1.5
    np.testing.assert_array_equal(
        random_erasing(img, np.random.default_rng(4), p=0.0), img
    )
    assert (img != 0).all(), "erasing must not mutate its input"


def test_train_augment_composition_and_policy_validation():
    img = _textured(100, 140)
    hyp = {"scale": 0.4, "fliplr": 0.5, "flipud": 0.0, "erasing": 0.4,
           "auto_augment": "randaugment", "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4}
    out = classify_train_augment(img, 64, np.random.default_rng(7), hyp)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # no policy -> jitter path
    out2 = classify_train_augment(
        img, 64, np.random.default_rng(7), {**hyp, "auto_augment": None}
    )
    assert out2.shape == (64, 64, 3)
    with pytest.raises(ValueError, match="auto_augment"):
        classify_train_augment(
            img, 64, np.random.default_rng(7), {**hyp, "auto_augment": "bogus"}
        )


def test_classification_dataset_pipelines(tmp_path):
    import cv2

    from yolov10_3d_tpu.data.dataset_tasks import ClassificationDataset

    for c in ("cats", "dogs"):
        (tmp_path / c).mkdir()
        for i in range(2):
            cv2.imwrite(
                str(tmp_path / c / f"{i}.jpg"),
                np.random.default_rng(i).integers(0, 256, (50, 70, 3), np.uint8),
            )
    hyp = {"scale": 0.4, "fliplr": 0.5, "flipud": 0.0, "erasing": 0.4,
           "auto_augment": "randaugment", "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4}
    train = ClassificationDataset(tmp_path, imgsz=32, augment=True, hyp=hyp)
    val = ClassificationDataset(tmp_path, imgsz=32, crop_fraction=0.9)
    assert len(train) == 4 and train.names == {0: "cats", 1: "dogs"}
    for ds in (train, val):
        s = ds[0]
        assert s["img"].shape == (32, 32, 3) and s["img"].dtype == np.uint8
        assert s["gt_labels"] == 0
    assert val[3]["gt_labels"] == 1
