"""Dataset file/label utilities (reference: data/utils.py —
verify_image_label::~100, polygon2mask:520, check_cls_dataset:420,
img2label_paths:38, autosplit:560). Offline: no downloads; dataset YAML
resolution lives in cfg.check_det_dataset."""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def img2label_paths(img_paths: Sequence[str]) -> List[str]:
    """images/ -> labels/ on the LAST occurrence only (reference
    data/utils.py:38 uses rsplit(sa, 1) — replacing every occurrence maps
    .../images/x/images/a.jpg to a doubly-rewritten path); suffix -> .txt."""
    import os

    sa = f"{os.sep}images{os.sep}"
    sb = f"{os.sep}labels{os.sep}"
    out = []
    for p in img_paths:
        p = str(p)
        if sa in p:
            p = sb.join(p.rsplit(sa, 1))
        elif "/images/" in p:  # posix-style input on any platform
            p = "/labels/".join(p.rsplit("/images/", 1))
        out.append(str(Path(p).with_suffix(".txt")))
    return out


def verify_image(path) -> Tuple[bool, str]:
    """Image integrity check (reference verify_image): openable, >=10px."""
    from PIL import Image

    try:
        with Image.open(path) as im:
            im.verify()
            w, h = im.size
        if w < 10 or h < 10:
            return False, f"image size {w}x{h} < 10 pixels"
        return True, ""
    except Exception as e:
        return False, str(e)


def verify_image_label(img_path, label_path, num_cls: int, nkpt: int = 0, ndim: int = 0):
    """Validate one (image, YOLO-label) pair (reference verify_image_label):
    returns (ok, msg, labels (N,5+) float32 or None). Checks: image opens,
    label parses, class ids < num_cls, coords normalized in [0,1], dedup."""
    ok, msg = verify_image(img_path)
    if not ok:
        return False, f"{img_path}: {msg}", None
    p = Path(label_path)
    ncols = 5 + (nkpt * ndim if nkpt else 0)
    if not p.exists():
        return True, "missing label (treated as background)", np.zeros((0, ncols), np.float32)
    try:
        rows = [ln.split() for ln in p.read_text().splitlines() if ln.strip()]
        lb = np.array(rows, np.float32).reshape(-1, len(rows[0]) if rows else ncols)
    except Exception as e:
        return False, f"{label_path}: unparsable ({e})", None
    if lb.size:
        if lb.shape[1] < 5:
            return False, f"{label_path}: expected >=5 columns, got {lb.shape[1]}", None
        if (lb[:, 0].astype(int) >= num_cls).any() or (lb[:, 0] < 0).any():
            return False, f"{label_path}: class id out of range [0, {num_cls})", None
        if (lb[:, 1:5] < 0).any() or (lb[:, 1:5] > 1).any():
            return False, f"{label_path}: non-normalized coordinates", None
        uniq = np.unique(lb, axis=0)
        if len(uniq) < len(lb):
            lb = uniq
            return True, f"removed {len(rows) - len(uniq)} duplicate labels", lb
    return True, "", lb


def polygon2mask(imgsz: Tuple[int, int], polygons, color: int = 1, downsample_ratio: int = 1) -> np.ndarray:
    """Rasterize polygon(s) to a binary mask (reference data/utils.py:520 —
    cv2.fillPoly there; PIL here)."""
    from PIL import Image, ImageDraw

    h, w = imgsz
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    # accept one polygon (points / flat xy) or a list of polygons
    def _is_single(p):
        if isinstance(p, np.ndarray):
            return p.ndim <= 2
        return len(p) and np.isscalar(np.asarray(p[0]).reshape(-1)[0]) and (
            np.asarray(p[0]).size <= 2
        )

    polys = [polygons] if _is_single(polygons) else list(polygons)
    for poly in polys:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        draw.polygon([(float(x), float(y)) for x, y in pts], fill=color)
    mask = np.asarray(img, np.uint8)
    if downsample_ratio > 1:
        mask = mask[::downsample_ratio, ::downsample_ratio]
    return mask


def polygons2masks(imgsz, polygons, color: int = 1, downsample_ratio: int = 1) -> np.ndarray:
    """One mask per polygon (reference polygons2masks)."""
    return np.stack(
        [polygon2mask(imgsz, p, color, downsample_ratio) for p in polygons], 0
    ) if len(polygons) else np.zeros((0, *imgsz), np.uint8)


def polygons2masks_overlap(imgsz, segments, downsample_ratio: int = 1):
    """Single overlap-indexed mask, larger polygons drawn first (reference
    polygons2masks_overlap) -> (mask, sorted_index)."""
    masks = [polygon2mask(imgsz, s, 1, downsample_ratio) for s in segments]
    areas = np.array([m.sum() for m in masks])
    order = np.argsort(-areas)
    # accumulator dims come from the actual downsampled masks (stride
    # slicing ceils; floor-division here broadcast-errored on non-divisible
    # sizes — review finding)
    shape = masks[0].shape if masks else (
        -(-imgsz[0] // downsample_ratio), -(-imgsz[1] // downsample_ratio)
    )
    mask = np.zeros(shape, np.uint8)
    for i, idx in enumerate(order):
        m = masks[idx]
        mask = np.where((m > 0) & (mask == 0), i + 1, mask)
    return mask, order


def check_cls_dataset(path, split: str = "") -> Dict:
    """Classification dataset layout check (reference data/utils.py:420):
    root/{train,val|test}/<class dirs>/images. No downloads."""
    root = Path(path)
    if not root.is_dir():
        raise FileNotFoundError(f"classification dataset not found: {root}")
    train = root / "train"
    val = next((root / n for n in ("val", "validation", "test") if (root / n).is_dir()), None)
    if not train.is_dir():
        raise FileNotFoundError(f"{root}/train missing")
    names = sorted(d.name for d in train.iterdir() if d.is_dir())
    data = {
        "train": str(train),
        "val": str(val) if val else None,
        "nc": len(names),
        "names": dict(enumerate(names)),
    }
    for split_dir in filter(None, (train, val)):
        n = sum(
            1 for f in split_dir.rglob("*")
            if f.suffix.lstrip(".").lower() in IMG_FORMATS
        )
        data[f"{split_dir.name}_images"] = n
    return data


def autosplit(
    path, weights: Tuple[float, float, float] = (0.9, 0.1, 0.0), annotated_only: bool = False,
    seed: int = 0,
):
    """Write autosplit_{train,val,test}.txt next to an image dir (reference
    data/utils.py:560)."""
    path = Path(path)
    files = sorted(
        f for f in path.rglob("*") if f.suffix.lstrip(".").lower() in IMG_FORMATS
    )
    if annotated_only:
        labels = img2label_paths([str(f) for f in files])
        files = [f for f, lb in zip(files, labels) if Path(lb).exists()]
    rng = random.Random(seed)
    names = ("autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt")
    for n in names:
        (path.parent / n).unlink(missing_ok=True)
    for f in files:
        i = rng.choices((0, 1, 2), weights=weights)[0]
        with open(path.parent / names[i], "a") as fh:
            fh.write(f"./{f.relative_to(path.parent)}\n")
    return [str(path.parent / n) for n in names]
