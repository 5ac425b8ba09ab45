"""Solution apps over Results (reference: ultralytics/solutions/ —
object_counter, heatmap, speed_estimation, distance_calculation, ai_gym).

Compact numpy/cv2 reimplementations driven by the tracker output stream."""

from .object_counter import ObjectCounter  # noqa: F401
from .heatmap import Heatmap  # noqa: F401
from .speed_estimation import SpeedEstimator  # noqa: F401
from .distance_calculation import DistanceCalculator  # noqa: F401
