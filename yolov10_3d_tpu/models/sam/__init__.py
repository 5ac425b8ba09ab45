"""SAM (Segment Anything Model) family, TPU-native.

Reference: ultralytics/models/sam/ (build.py, modules/{encoders,decoders,
transformer,sam}.py, predict.py, amg.py). Re-designed for TPU: NHWC layouts,
static shapes (padded point prompts with -1 labels), windowed attention with
static pad/reshape partitioning, jit-compiled encode/decode paths.
"""

from .build import Sam, build_mobile_sam, build_sam, build_sam_vit_b, build_sam_vit_h, build_sam_vit_l
from .model import SAM
from .predict import SAMPredictor

__all__ = [
    "Sam",
    "SAM",
    "SAMPredictor",
    "build_sam",
    "build_sam_vit_b",
    "build_sam_vit_l",
    "build_sam_vit_h",
    "build_mobile_sam",
]
