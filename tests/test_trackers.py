"""ByteTrack / BoT-SORT behavior on synthetic moving boxes."""

import numpy as np

from yolov10_3d_tpu.trackers import BOTSORT, BYTETracker


def _moving_scene(n_frames=12):
    """Two objects moving right; frame t returns (boxes, scores, classes)."""
    frames = []
    for t in range(n_frames):
        b1 = [10 + 4 * t, 20, 60 + 4 * t, 80]
        b2 = [200 - 3 * t, 100, 260 - 3 * t, 180]
        frames.append(
            (np.array([b1, b2], float), np.array([0.9, 0.85]), np.array([0, 2]))
        )
    return frames


def test_bytetrack_consistent_ids():
    tracker = BYTETracker()
    ids_per_frame = []
    for boxes, scores, classes in _moving_scene():
        out = tracker.update(boxes, scores, classes)
        ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    # after activation (frame 1+), the same two ids persist
    assert len(ids_per_frame[-1]) == 2
    for ids in ids_per_frame[2:]:
        assert ids == ids_per_frame[2]
    # classes preserved
    out_last = tracker.update(*_moving_scene(13)[-1])
    assert set(out_last[:, 6].astype(int)) == {0, 2}


def test_bytetrack_occlusion_recovery():
    tracker = BYTETracker(track_buffer=30)
    frames = _moving_scene(14)
    ids_before = None
    for t, (boxes, scores, classes) in enumerate(frames):
        if 5 <= t <= 7:  # object 1 occluded for 3 frames
            out = tracker.update(boxes[1:], scores[1:], classes[1:])
        else:
            out = tracker.update(boxes, scores, classes)
        if t == 4:
            ids_before = set(out[:, 4].astype(int))
    ids_after = set(out[:, 4].astype(int))
    # the occluded track is re-found with its original id
    assert ids_before == ids_after


def test_low_score_rescue():
    tracker = BYTETracker()
    frames = _moving_scene(8)
    for t, (boxes, scores, classes) in enumerate(frames):
        if t == 4:  # object confidence dips below high threshold
            scores = np.array([0.3, 0.85])
        out = tracker.update(boxes, scores, classes)
    assert len(out) == 2  # low-score association kept the track alive


def test_botsort_with_camera_motion():
    tracker = BOTSORT(gmc_method="none")
    for boxes, scores, classes in _moving_scene(6):
        img = np.zeros((240, 320, 3), np.uint8)
        out = tracker.update(boxes, scores, classes, img=img)
    assert len(out) == 2
