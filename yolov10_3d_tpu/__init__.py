"""yolov10_3d_tpu — TPU-native YOLOv10 + monocular-3D detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of baldhat/yolov10-3D
(an Ultralytics v8.1.34 fork carrying THU-MIG YOLOv10 and a monocular-3D
extension). Not a port: pure-functional models over pytrees, pjit/shard_map
data parallelism over device meshes, NMS-free top-k postprocessing as fused
XLA ops, Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "YOLOv10", "YOLOv10_3D", "__version__"]


def __getattr__(name):  # lazy: engine pulls in optax/orbax, keep import light
    if name in ("YOLO", "YOLOv10", "YOLOv10_3D"):
        from yolov10_3d_tpu.engine import model as _m

        return getattr(_m, name)
    raise AttributeError(name)
