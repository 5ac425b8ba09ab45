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


def test_object_counter_annotated_frame_and_classwise():
    from yolov10_3d_tpu.solutions import ObjectCounter

    counter = ObjectCounter(
        region=[(0, 0), (100, 0), (100, 100), (0, 100)],
        names={0: "person"},
        draw_tracks=True,
    )
    img = np.zeros((120, 240, 3), np.uint8)
    out1 = counter.start_counting(img, np.array([[200, 20, 220, 40, 7, 0.9, 0]]))
    out2 = counter.start_counting(img, np.array([[40, 40, 60, 60, 7, 0.9, 0]]))
    assert out2.shape == img.shape and out2.any()  # region+box drawn
    assert counter.in_count == 1
    assert counter.classwise["person"]["in"] == 1
    counter.move_region_point(0, (5, 5))
    assert counter.region[0] == (5.0, 5.0)


def test_heatmap_region_counts_and_render():
    from yolov10_3d_tpu.solutions import Heatmap

    hm = Heatmap((100, 100), count_reg_pts=[(0, 0), (50, 0), (50, 100), (0, 100)])
    img = np.zeros((100, 100, 3), np.uint8)
    out = hm.generate_heatmap(img, np.array([[10, 10, 30, 30, 1, 0.9, 0]]))
    assert out.shape == img.shape and out.any()
    assert hm.in_counts + hm.out_counts == 1
    # decay shrinks the accumulator when nothing is splatted
    peak = hm.acc.max()
    hm.update(np.zeros((0, 7)))
    assert hm.acc.max() < peak


def test_speed_estimator_region_mode():
    from yolov10_3d_tpu.solutions import SpeedEstimator

    est = SpeedEstimator(reg_pts=[(0, 60), (200, 40)], pixels_per_meter=10)
    img = np.zeros((100, 200, 3), np.uint8)
    # track descends through both region lines; inject timestamps
    for i, (y, t) in enumerate([(80, 0.0), (60, 1.0), (40, 2.0)]):
        est.estimate_speed(img, np.array([[90, y - 5, 110, y + 5, 3, 0.9, 0]]), t=t)
    assert 3 in est.dist_data and est.dist_data[3] > 0


def test_distance_selection_flow():
    from yolov10_3d_tpu.solutions import DistanceCalculator

    dc = DistanceCalculator(pixels_per_meter=10)
    tracks = np.array([[0, 0, 10, 10, 1, 0.9, 0], [40, 0, 50, 10, 2, 0.9, 0]])
    img = np.zeros((60, 60, 3), np.uint8)
    dc.start_process(img, tracks)
    assert dc.select(5, 5) == 1 and dc.select(45, 5) == 2
    out = dc.start_process(img, tracks)
    assert out.any() and len(dc.selected_boxes) == 2
    m, mm = dc.calculate_distance((5, 5), (45, 5))
    assert abs(m - 4.0) < 1e-6 and abs(mm - 4000.0) < 1e-3
    dc.deselect()
    assert not dc.selected_boxes


def test_ai_gym_counts_reps():
    from yolov10_3d_tpu.solutions import AIGym

    gym = AIGym(kpts_to_check=[0, 1, 2], pose_type="pushup")

    def pose(angle_deg):
        # three keypoints with the given elbow angle at kpt 1
        a = np.deg2rad(angle_deg)
        return np.array([[[50 + 30 * np.cos(a), 50 + 30 * np.sin(a), 1.0],
                          [50.0, 50.0, 1.0],
                          [80.0, 50.0, 1.0]]])

    img = np.zeros((100, 100, 3), np.uint8)
    for ang in (170, 170, 60, 170, 60):  # two full pushups
        out = gym.start_counting(img, pose(ang))
    assert gym.count[0] == 2
    assert out.shape == img.shape


def test_annotator_pose_angle_and_geometry():
    from yolov10_3d_tpu.solutions import (
        point_in_polygon, point_segment_distance, polygon_centroid,
        segments_intersect,
    )
    from yolov10_3d_tpu.utils.plotting import Annotator

    assert abs(Annotator.estimate_pose_angle((1, 0), (0, 0), (0, 1)) - 90.0) < 1e-9
    assert abs(Annotator.estimate_pose_angle((1, 0), (0, 0), (-1, 0)) - 180.0) < 1e-9
    assert point_in_polygon((5, 5), [(0, 0), (10, 0), (10, 10), (0, 10)])
    assert not point_in_polygon((15, 5), [(0, 0), (10, 0), (10, 10), (0, 10)])
    assert abs(point_segment_distance((0, 5), (-10, 0), (10, 0)) - 5.0) < 1e-12
    cx, cy = polygon_centroid([(0, 0), (10, 0), (10, 10), (0, 10)])
    assert abs(cx - 5) < 1e-9 and abs(cy - 5) < 1e-9
    assert segments_intersect((0, 0), (10, 10), (0, 10), (10, 0))
    assert not segments_intersect((0, 0), (1, 1), (5, 5), (6, 6))


def test_results_plot_returns_annotated():
    from yolov10_3d_tpu.engine.results import Boxes, Results

    img = np.zeros((64, 64, 3), np.uint8)
    data = np.array([[5, 5, 30, 30, 0.9, 0]], np.float32)
    r = Results(orig_img=img, path="x.jpg", names={0: "person"}, boxes=data)
    out = r.plot()
    assert out.shape == img.shape and out.any()
