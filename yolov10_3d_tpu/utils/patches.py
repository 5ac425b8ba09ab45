"""I/O shims (reference: utils/patches.py — cv2 imread/imwrite/torch.save
patches for non-ASCII paths). cv2 is absent here; these are PIL-backed
equivalents with the same signatures, used wherever reference code reads or
writes images."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def imread(filename, flags=None) -> np.ndarray:
    """RGB uint8 ndarray (the reference returns BGR via cv2; every consumer
    in this package is RGB-native, so no channel swap)."""
    from PIL import Image

    with Image.open(filename) as im:
        if flags == 0:  # cv2.IMREAD_GRAYSCALE analogue
            return np.asarray(im.convert("L"))
        return np.asarray(im.convert("RGB"))


def imwrite(filename, img: np.ndarray, params=None) -> bool:
    """Write an RGB (or grayscale) uint8 ndarray."""
    from PIL import Image

    try:
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = arr.clip(0, 255).astype(np.uint8)
        Image.fromarray(arr).save(str(filename))
        return True
    except Exception:
        return False


def imshow(winname: str, mat) -> None:
    """No-op in this headless environment (reference patches cv2.imshow)."""
    from . import LOGGER

    LOGGER.debug(f"imshow({winname!r}) skipped: headless environment")
