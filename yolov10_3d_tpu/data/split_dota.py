"""DOTA image tiling (reference: data/split_dota.py — sliding-window crops of
large aerial images with IoF-filtered polygon labels).

Same algorithm, numpy/cv2 only: windows of ``crop_size`` with ``gap`` overlap
(last window snapped to the image border), windows kept when their
in-image area ratio exceeds ``im_rate_thr`` (:89-129 ``get_windows``), labels
assigned to windows by polygon-in-window IoF >= 0.7 (:20-54 ``bbox_iof``,
:132-143 ``get_window_obj``), crops + shifted labels written out
(:146-187 ``crop_and_save``). Labels are YOLO-OBB format: cls + 8 normalized
polygon coords per row.
"""

from __future__ import annotations

from math import ceil
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np


def bbox_iof(polygons: np.ndarray, windows: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """(N, 8) polygons x (M, 4) xyxy windows -> (N, M) intersection-over-
    foreground (polygon area). Uses the polygon's bounding box for the
    intersection estimate then exact shoelace area for the foreground,
    mirroring the reference's two-stage computation."""
    polys = polygons.reshape(-1, 4, 2)
    lt = polys.min(1)  # (N,2)
    rb = polys.max(1)
    lt_i = np.maximum(lt[:, None], windows[None, :, :2])
    rb_i = np.minimum(rb[:, None], windows[None, :, 2:])
    wh = np.clip(rb_i - lt_i, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    x, y = polys[..., 0], polys[..., 1]
    area = 0.5 * np.abs(
        (x * np.roll(y, -1, axis=1) - y * np.roll(x, -1, axis=1)).sum(1)
    )
    return inter / (area[:, None] + eps)


def get_windows(
    im_size: Tuple[int, int],
    crop_sizes: Sequence[int] = (1024,),
    gaps: Sequence[int] = (200,),
    im_rate_thr: float = 0.6,
    eps: float = 0.01,
) -> np.ndarray:
    """(h, w) -> (M, 4) xyxy crop windows (reference :89-129)."""
    h, w = im_size
    windows = []
    for crop_size, gap in zip(crop_sizes, gaps):
        assert crop_size > gap, f"invalid crop_size gap pair [{crop_size} {gap}]"
        step = crop_size - gap
        xn = 1 if w <= crop_size else ceil((w - crop_size) / step + 1)
        xs = [step * i for i in range(xn)]
        if len(xs) > 1 and xs[-1] + crop_size > w:
            xs[-1] = w - crop_size
        yn = 1 if h <= crop_size else ceil((h - crop_size) / step + 1)
        ys = [step * i for i in range(yn)]
        if len(ys) > 1 and ys[-1] + crop_size > h:
            ys[-1] = h - crop_size
        start = np.array([[x, y] for x in xs for y in ys], np.int64)
        stop = start + crop_size
        windows.append(np.concatenate([start, stop], 1))
    windows = np.concatenate(windows, 0)
    # in-image area ratio filter
    im_in = windows.copy()
    im_in[:, 0::2] = np.clip(im_in[:, 0::2], 0, w)
    im_in[:, 1::2] = np.clip(im_in[:, 1::2], 0, h)
    im_areas = (im_in[:, 2] - im_in[:, 0]) * (im_in[:, 3] - im_in[:, 1])
    win_areas = (windows[:, 2] - windows[:, 0]) * (windows[:, 3] - windows[:, 1])
    rates = im_areas / win_areas
    if not (rates > im_rate_thr).any():
        rates[rates == rates.max()] = 1.0
    return windows[rates > im_rate_thr]


def get_window_obj(labels: np.ndarray, windows: np.ndarray, iof_thr: float = 0.7) -> List[np.ndarray]:
    """labels (N, 9) cls + 8 polygon px coords -> per-window label subsets."""
    if len(labels) == 0:
        return [np.zeros((0, 9), np.float32) for _ in range(len(windows))]
    iofs = bbox_iof(labels[:, 1:], windows.astype(np.float64))
    return [labels[iofs[:, i] >= iof_thr] for i in range(len(windows))]


def crop_and_save(
    name: str, img: np.ndarray, labels: np.ndarray, windows: np.ndarray,
    window_objs: List[np.ndarray], im_dir, lb_dir,
):
    """Write window crops + window-frame normalized labels (reference :146)."""
    import cv2

    im_dir = Path(im_dir)
    lb_dir = Path(lb_dir)
    im_dir.mkdir(parents=True, exist_ok=True)
    lb_dir.mkdir(parents=True, exist_ok=True)
    for i, win in enumerate(windows):
        x1, y1, x2, y2 = (int(v) for v in win)
        patch = img[y1:y2, x1:x2]
        ph, pw = patch.shape[:2]
        stem = f"{name}__{x2 - x1}__{x1}___{y1}"
        cv2.imwrite(str(im_dir / f"{stem}.jpg"), patch[..., ::-1])
        objs = window_objs[i]
        lines = []
        for row in objs:
            coords = row[1:].reshape(4, 2) - np.array([x1, y1], np.float64)
            coords[:, 0] = np.clip(coords[:, 0] / pw, 0, 1)
            coords[:, 1] = np.clip(coords[:, 1] / ph, 0, 1)
            flat = " ".join(f"{v:.6g}" for v in coords.reshape(-1))
            lines.append(f"{int(row[0])} {flat}")
        (lb_dir / f"{stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))


def split_images_and_labels(
    data_root, save_dir, split: str = "train",
    crop_sizes: Sequence[int] = (1024,), gaps: Sequence[int] = (200,),
):
    """data_root/images/{split}/*.jpg + labels/{split}/*.txt (YOLO-OBB rows)
    -> save_dir/images/{split}, labels/{split} tiled (reference :190-218)."""
    import cv2

    data_root = Path(data_root)
    save_dir = Path(save_dir)
    im_dir_in = data_root / "images" / split
    lb_dir_in = data_root / "labels" / split
    count = 0
    for im_file in sorted(im_dir_in.glob("*")):
        if im_file.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        img = cv2.cvtColor(cv2.imread(str(im_file)), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        lb_file = lb_dir_in / (im_file.stem + ".txt")
        labels = np.zeros((0, 9), np.float64)
        if lb_file.exists():
            rows = [l.split() for l in lb_file.read_text().splitlines() if l.strip()]
            if rows:
                labels = np.array([[float(v) for v in r[:9]] for r in rows], np.float64)
                labels[:, 1::2] *= w  # de-normalize polygon coords
                labels[:, 2::2] *= h
        windows = get_windows((h, w), crop_sizes, gaps)
        window_objs = get_window_obj(labels, windows)
        crop_and_save(
            im_file.stem, img, labels, windows, window_objs,
            save_dir / "images" / split, save_dir / "labels" / split,
        )
        count += len(windows)
    return count


def split_trainval(data_root, save_dir, crop_size: int = 1024, gap: int = 200):
    """Tile train + val (reference :221 ``split_trainval``); multi-scale via
    the reference's rates is expressed by passing several crop_sizes."""
    n = 0
    for split in ("train", "val"):
        if (Path(data_root) / "images" / split).exists():
            n += split_images_and_labels(data_root, save_dir, split, (crop_size,), (gap,))
    return n
