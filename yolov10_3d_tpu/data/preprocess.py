"""Inference preprocessing (reference: data/augment.py:684 ``LetterBox``,
engine/predictor.py:115 ``preprocess``).

Host-side numpy/cv2 resize + pad (matches the reference pixel-for-pixel), then
a single HWC->NHWC fp32/255 device upload. The fused on-device variant for the
training pipeline lives in ops/pallas (later rounds).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def letterbox_geometry(
    shape: Tuple[int, int],
    new_shape: Union[int, Tuple[int, int]],
    scaleup: bool = True,
    center: bool = True,
    auto: bool = False,
    stride: int = 32,
) -> Tuple[float, float, float]:
    """(ratio, dw, dh) of ``letterbox`` for a source (h, w) WITHOUT touching
    pixels — exact same math, shared so callers that only need the geometry
    (task eval datasets placing polygons/keypoints) skip a second decode."""
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(shape[1] * r), round(shape[0] * r))  # w, h
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    if center:
        dw /= 2
        dh /= 2
    return r, dw, dh


def letterbox(
    img: np.ndarray,
    new_shape: Union[int, Tuple[int, int]] = (640, 640),
    color: int = 114,
    auto: bool = False,
    scale_fill: bool = False,
    scaleup: bool = True,
    center: bool = True,
    stride: int = 32,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Resize + pad to new_shape (h, w). Returns (img, ratio, (dw, dh))."""
    shape = img.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r, dw, dh = letterbox_geometry(
        shape, new_shape, scaleup=scaleup, center=center, auto=auto, stride=stride
    )
    new_unpad = (round(shape[1] * r), round(shape[0] * r))  # w, h

    if shape[::-1] != new_unpad:
        if cv2 is not None:
            img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
        else:
            from PIL import Image

            img = np.asarray(Image.fromarray(img).resize(new_unpad, Image.BILINEAR))
    top, bottom = int(round(dh - 0.1)) if center else 0, int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)) if center else 0, int(round(dw + 0.1))
    out = np.full(
        (img.shape[0] + top + bottom, img.shape[1] + left + right, img.shape[2]),
        color,
        dtype=img.dtype,
    )
    out[top : top + img.shape[0], left : left + img.shape[1]] = img
    return out, r, (dw, dh)


def preprocess_batch(
    imgs: Sequence[np.ndarray], imgsz: Union[int, Tuple[int, int]] = 640
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Letterbox a list of HWC RGB uint8 images to one NHWC fp32 [0,1] batch.
    Returns (batch, original (h, w) per image)."""
    if isinstance(imgsz, int):
        shape = (imgsz, imgsz)
    else:
        shape = (imgsz[1], imgsz[0]) if len(imgsz) == 2 else tuple(imgsz)  # w,h -> h,w
    orig_shapes = [im.shape[:2] for im in imgs]
    out = np.stack([letterbox(im, shape)[0] for im in imgs])
    return out.astype(np.float32) / 255.0, orig_shapes
