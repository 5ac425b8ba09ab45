"""Streaming inference sources (reference data/loaders.py:33,186,441):
threaded LoadStreams on a fake (file-backed) stream, tensor sources, and the
predictor's generator mode."""

from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_video(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    p = tmp_path_factory.mktemp("vid") / "clip.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    if not w.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    w.release()
    return p


def test_is_stream_source():
    from yolov10_3d_tpu.data.loaders import is_stream_source

    assert is_stream_source(0)
    assert is_stream_source("0")
    assert is_stream_source("rtsp://cam/live")
    assert is_stream_source("list.streams")
    assert not is_stream_source("img.jpg")
    assert not is_stream_source(np.zeros((4, 4, 3), np.uint8))


def test_load_streams_buffered(small_video):
    from yolov10_3d_tpu.data.loaders import LoadStreams

    s = LoadStreams(str(small_video), buffer=True)
    frames = []
    for paths, imgs in s:
        assert len(paths) == len(imgs) == 1
        assert imgs[0].shape == (48, 64, 3)
        frames.append(imgs[0])
        if len(frames) >= 12:
            break
    s.close()
    assert len(frames) >= 10  # mp4 round-trips all frames


def test_load_streams_file_list(small_video, tmp_path):
    from yolov10_3d_tpu.data.loaders import LoadStreams

    lst = tmp_path / "src.streams"
    lst.write_text(f"{small_video}\n{small_video}\n")
    s = LoadStreams(str(lst), buffer=True)
    assert len(s) == 2
    got = next(iter(s))
    assert len(got[1]) == 2
    s.close()


def test_load_tensor_variants():
    from yolov10_3d_tpu.data.loaders import LoadTensor

    rng = np.random.default_rng(0)
    # BHWC float [0,1]
    t = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    frames = list(LoadTensor(t))
    assert len(frames) == 2 and frames[0][1].dtype == np.uint8
    # BCHW -> transposed
    t2 = rng.uniform(0, 1, (2, 3, 32, 40)).astype(np.float32)
    assert list(LoadTensor(t2))[0][1].shape == (32, 40, 3)
    # HWC uint8 single
    t3 = rng.integers(0, 255, (32, 32, 3), np.uint8)
    assert list(LoadTensor(t3))[0][1].shape == (32, 32, 3)
    # un-normalized float rejected (reference loaders.py:470)
    with pytest.raises(ValueError):
        LoadTensor(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))


def test_predict_stream_generator(small_video):
    """predict(stream=True) yields Results lazily from a video."""
    import types

    from yolov10_3d_tpu import YOLOv10

    m = YOLOv10("yolov10n.yaml")
    gen = m.predict(str(small_video), stream=True, imgsz=64, conf=0.0, max_det=5)
    assert isinstance(gen, types.GeneratorType)
    first = next(gen)
    assert first.orig_shape == (48, 64)
    n = 1 + sum(1 for _ in gen)
    assert n >= 10


def test_predict_tensor_source():
    """4D float tensor batch as a predict source (reference LoadTensor)."""
    from yolov10_3d_tpu import YOLOv10

    m = YOLOv10("yolov10n.yaml")
    t = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    res = m.predict(t, imgsz=64, conf=0.0, max_det=5)
    assert len(res) == 2
