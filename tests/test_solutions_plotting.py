"""Solutions apps + plotting utilities."""

import numpy as np
import pytest


def test_object_counter_line_crossing():
    from yolov10_3d_tpu.solutions import ObjectCounter

    counter = ObjectCounter(region=[(50, 0), (50, 100)])  # vertical line at x=50
    for x in (10, 30, 48, 52, 70):  # one track moving right across the line
        tracks = np.array([[x - 5, 40, x + 5, 60, 1, 0.9, 0]])
        counts = counter.update(tracks)
    assert counts["in"] + counts["out"] == 1


def test_object_counter_region():
    from yolov10_3d_tpu.solutions import ObjectCounter

    counter = ObjectCounter(region=[(0, 0), (100, 0), (100, 100), (0, 100)])
    counter.update(np.array([[200, 200, 220, 220, 7, 0.9, 0]]))  # outside
    counts = counter.update(np.array([[40, 40, 60, 60, 7, 0.9, 0]]))  # enters
    assert counts["in"] == 1


def test_speed_and_distance():
    from yolov10_3d_tpu.solutions import DistanceCalculator, SpeedEstimator

    est = SpeedEstimator(fps=30, pixels_per_meter=10)
    for t in range(5):
        speeds = est.update(np.array([[t * 30, 0, t * 30 + 10, 10, 3, 0.9, 0]]))
    # 30 px/frame = 3 m/frame = 90 m/s = 324 km/h
    assert abs(speeds[3] - 324.0) < 1.0

    dc = DistanceCalculator(pixels_per_meter=10)
    d = dc.update(
        np.array([[0, 0, 10, 10, 1, 0.9, 0], [40, 0, 50, 10, 2, 0.9, 0]])
    )
    assert abs(d[(1, 2)] - 4.0) < 1e-6  # 40 px apart = 4 m


def test_heatmap():
    from yolov10_3d_tpu.solutions import Heatmap

    hm = Heatmap((50, 50))
    acc = hm.update(np.array([[10, 10, 20, 20, 1, 0.9, 0]]))
    assert acc[15, 15] > 0 and acc[40, 40] == 0


def test_plot_images_and_results(tmp_path):
    pytest.importorskip("cv2")
    from yolov10_3d_tpu.utils.plotting import plot_images, plot_results

    imgs = np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    boxes = np.tile(np.array([[0.5, 0.5, 0.4, 0.3]], np.float32), (4, 2, 1))
    labels = np.zeros((4, 2), np.int32)
    out = plot_images(imgs, boxes, labels, fname=str(tmp_path / "batch.jpg"))
    assert out and (tmp_path / "batch.jpg").exists()

    csv_path = tmp_path / "results.csv"
    csv_path.write_text("epoch,loss,lr\n0,5.0,0.001\n1,4.0,0.001\n2,3.5,0.0009\n")
    png = plot_results(csv_path)
    if png:  # matplotlib available
        assert (tmp_path / "results.png").exists()


def test_kitti_visualizer(tmp_path):
    pytest.importorskip("cv2")
    from yolov10_3d_tpu.data.kitti_utils import Calibration
    import numpy as np

    from yolov10_3d_tpu.utils.plotting import KITTIVisualizer

    calib = Calibration(
        {
            "P2": np.array([[700.0, 0, 620, 40], [0, 700.0, 180, 0.2], [0, 0, 1, 0.003]], np.float32),
            "R0": np.eye(3, dtype=np.float32),
            "Tr_velo2cam": np.eye(3, 4, dtype=np.float32),
        }
    )
    viz = KITTIVisualizer()
    img = np.zeros((375, 1242, 3), np.uint8)
    rows = [[0, 0.1, 500, 150, 700, 300, 1.5, 1.6, 3.9, 1.0, 1.6, 15.0, 0.5, 0.9]]
    out = viz.plot_preds(img, rows, calib, str(tmp_path / "viz.jpg"))
    assert out and (tmp_path / "viz.jpg").exists()
    bev = viz.plot_bev(rows, rows, str(tmp_path / "bev.png"))
    if bev:
        assert (tmp_path / "bev.png").exists()
