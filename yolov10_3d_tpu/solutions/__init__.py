"""Solution apps over tracked detections (reference: ultralytics/solutions/ —
object_counter, heatmap, speed_estimation, distance_calculation, ai_gym).

numpy/PIL reimplementations driven by the tracker output stream; the
reference's cv2 windows/mouse callbacks become programmatic APIs
(`move_region_point`, `select`) so the apps run headless."""

from .ai_gym import AIGym  # noqa: F401
from .distance_calculation import DistanceCalculator  # noqa: F401
from .geometry import (  # noqa: F401
    point_in_polygon, point_segment_distance, polygon_centroid,
    polyline_distance, segments_intersect,
)
from .heatmap import Heatmap  # noqa: F401
from .object_counter import ObjectCounter  # noqa: F401
from .speed_estimation import SpeedEstimator  # noqa: F401
