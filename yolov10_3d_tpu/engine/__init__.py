from .model import Model, YOLO, YOLOv10, YOLOv10_3D  # noqa: F401
