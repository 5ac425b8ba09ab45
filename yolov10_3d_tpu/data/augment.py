"""Training augmentations (reference: data/augment.py — Mosaic:135, MixUp:326,
RandomPerspective:347, RandomHSV:584, RandomFlip:627, v8_transforms:973).

Host-side numpy/cv2 (the reference is cv2 too); labels are (n, 5) =
[cls, x1, y1, x2, y2] in absolute pixels throughout, converted to normalized
xywh only at batch-format time.

Per-instance geometry beyond boxes rides a single ``points`` array of shape
(n, P, D) aligned row-for-row with ``labels``: resampled segment polygons
(P=K, D=2), pose keypoints (P=nk, D=2|3 with visibility last), or OBB corner
quads (P=4, D=2). ``kind`` ∈ {"segments", "keypoints", "corners"} selects the
task-specific semantics (segment-derived boxes after warp, keypoint
visibility masking, corner refits) the reference implements per-Instances
(augment.py:347 apply_segments/apply_keypoints)."""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .preprocess import letterbox


def random_hsv(img: np.ndarray, rng: np.random.Generator, hgain=0.015, sgain=0.7, vgain=0.4):
    """HSV jitter via LUTs (reference augment.py:584 ``RandomHSV``)."""
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        im_hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        dtype = img.dtype
        x = np.arange(0, 256, dtype=r.dtype)
        # one 3-channel LUT call instead of split/LUTx3/merge (measured
        # ~2x cheaper on the loader's single-core hot path)
        lut = np.stack(
            [
                ((x * r[0]) % 180).astype(dtype),
                np.clip(x * r[1], 0, 255).astype(dtype),
                np.clip(x * r[2], 0, 255).astype(dtype),
            ],
            -1,
        ).reshape(256, 1, 3)
        img = cv2.cvtColor(cv2.LUT(im_hsv, lut), cv2.COLOR_HSV2RGB)
    return img


def _unpack_item(item):
    """Accept (img, labels) or (img, labels, points) sample tuples."""
    img, labels, *rest = item
    return img, labels, (rest[0] if rest else None)


def _points_tail(items):
    """Trailing (P, D) dims of the items' points arrays (for empty results)."""
    for it in items:
        pts = _unpack_item(it)[2]
        if pts is not None and pts.ndim >= 3:
            return tuple(pts.shape[1:])
    return (1, 2)


def resample_polygon(pts: np.ndarray, k: int) -> np.ndarray:
    """Resample a closed polygon (n, 2) to exactly k points, uniformly by
    arclength (fixed-size representation so instance geometry batches as a
    dense (n, K, 2) array; the reference resamples by index —
    data/utils.py resample_segments — arclength spacing preserves shape
    better at small K)."""
    closed = np.concatenate([pts, pts[:1]], 0).astype(np.float64)
    seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
    t = np.concatenate([[0.0], np.cumsum(seg)])
    total = t[-1]
    if total <= 0:
        return np.repeat(pts[:1], k, 0).astype(np.float32)
    u = np.linspace(0, total, k, endpoint=False)
    return np.stack(
        [np.interp(u, t, closed[:, 0]), np.interp(u, t, closed[:, 1])], -1
    ).astype(np.float32)


def random_flip_lr(img, labels, rng, p=0.5, points=None, kind=None, flip_idx=None):
    """Horizontal flip (reference augment.py:627). For keypoints, ``flip_idx``
    swaps chiral pairs (left eye <-> right eye) like the reference RandomFlip."""
    if rng.random() < p:
        img = np.ascontiguousarray(img[:, ::-1])
        w = img.shape[1]
        if len(labels):
            x1 = labels[:, 1].copy()
            labels[:, 1] = w - labels[:, 3]
            labels[:, 3] = w - x1
        if points is not None and len(points):
            points = points.copy()
            points[..., 0] = w - points[..., 0]
            if kind == "keypoints" and flip_idx is not None and len(flip_idx):
                idx = np.asarray(flip_idx, int)
                if len(idx) != points.shape[1]:
                    raise ValueError(
                        f"flip_idx has {len(idx)} entries but keypoints have "
                        f"{points.shape[1]} points (reference augment.py:995)"
                    )
                points = points[:, idx]
        return img, labels, points, True
    return img, labels, points, False


def random_flip_ud(img, labels, rng, p=0.0, points=None):
    """Vertical flip (reference v8_transforms RandomFlip('vertical'))."""
    if p and rng.random() < p:
        img = np.ascontiguousarray(img[::-1])
        h = img.shape[0]
        if len(labels):
            y1 = labels[:, 2].copy()
            labels[:, 2] = h - labels[:, 4]
            labels[:, 4] = h - y1
        if points is not None and len(points):
            points = points.copy()
            points[..., 1] = h - points[..., 1]
    return img, labels, points


def mosaic4(
    items: List[Tuple[np.ndarray, np.ndarray]],
    imgsz: Tuple[int, int],
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """4-image mosaic (reference augment.py:135 ``Mosaic._mosaic4``).
    items: [(img HWC uint8, labels (n,5) cls+xyxy px)] x4; imgsz (h, w)."""
    sh, sw = imgsz
    yc = int(rng.uniform(sh // 2, 2 * sh - sh // 2))
    xc = int(rng.uniform(sw // 2, 2 * sw - sw // 2))
    canvas = np.full((sh * 2, sw * 2, 3), 114, np.uint8)
    out_labels, out_points, has_points = [], [], False
    for i, item in enumerate(items):
        img, labels, points = _unpack_item(item)
        has_points = has_points or points is not None
        h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, sw * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(sh * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, sw * 2), min(sh * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        if len(labels):
            lab = labels.copy()
            lab[:, [1, 3]] += x1a - x1b
            lab[:, [2, 4]] += y1a - y1b
            out_labels.append(lab)
            if points is not None:
                pts = points.copy()
                pts[..., 0] += x1a - x1b
                pts[..., 1] += y1a - y1b
                out_points.append(pts)
    labels = np.concatenate(out_labels) if out_labels else np.zeros((0, 5), np.float32)
    labels[:, 1:] = labels[:, 1:].clip(0, [sw * 2, sh * 2, sw * 2, sh * 2])
    points = np.concatenate(out_points) if out_points else None
    if points is not None and len(points) != len(labels):
        # a mix of points-carrying and points-less tiles would silently
        # attach wrong polygons/keypoints downstream
        raise ValueError(
            f"mosaic4: {len(labels)} label rows vs {len(points)} point rows — "
            "every tile of a points task must carry a points array"
        )
    if has_points and points is None:
        # all tiles empty: keep the task's (P, D) trailing dims (a (0,1,2)
        # placeholder crashed pose formatting and mixup concat — review fix)
        points = np.zeros((0,) + _points_tail(items), np.float32)
    return canvas, labels, points


def mosaic9(
    items: List[Tuple[np.ndarray, np.ndarray]],
    imgsz: Tuple[int, int],
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """9-image 3x3 mosaic (reference augment.py:208 ``Mosaic._mosaic9``).
    items: [(img HWC uint8, labels (n,5) cls+xyxy px)] x9; imgsz (h, w).
    Returns a (2h, 2w) canvas like mosaic4 (the reference crops its 3s canvas
    to 2s around a random center; we build 3s and crop identically)."""
    sh, sw = imgsz
    canvas = np.full((sh * 3, sw * 3, 3), 114, np.uint8)
    hp = wp = -1  # previous h/w
    out_labels, out_points, has_points = [], [], False
    for i, item in enumerate(items):
        img, labels, points = _unpack_item(item)
        has_points = has_points or points is not None
        # cap the long side at s like the reference's load_image rect resize
        h, w = img.shape[:2]
        r = min(sh / h, sw / w)
        if r < 1.0:
            img = cv2.resize(img, (max(int(w * r), 1), max(int(h * r), 1)))
            if len(labels):
                labels = labels.copy()
                labels[:, 1:5] *= r
                if points is not None:
                    points = points.copy()
                    points[..., :2] *= r
            h, w = img.shape[:2]
        if i == 0:  # center
            c = sw, sh, sw + w, sh + h
        elif i == 1:  # top
            c = sw, sh - h, sw + w, sh
        elif i == 2:  # top right
            c = sw + wp, sh - h, sw + wp + w, sh
        elif i == 3:  # right
            c = sw + w0, sh, sw + w0 + w, sh + h
        elif i == 4:  # bottom right
            c = sw + w0, sh + hp, sw + w0 + w, sh + hp + h
        elif i == 5:  # bottom
            c = sw + w0 - w, sh + h0, sw + w0, sh + h0 + h
        elif i == 6:  # bottom left
            c = sw + w0 - wp - w, sh + h0, sw + w0 - wp, sh + h0 + h
        elif i == 7:  # left
            c = sw - w, sh + h0 - h, sw, sh + h0
        else:  # top left
            c = sw - w, sh + h0 - hp - h, sw, sh + h0 - hp
        if i == 0:
            h0, w0 = h, w
        pad_x, pad_y = c[:2]
        x1, y1 = max(c[0], 0), max(c[1], 0)
        x2, y2 = min(c[2], 3 * sw), min(c[3], 3 * sh)
        canvas[y1:y2, x1:x2] = img[y1 - pad_y : y2 - pad_y, x1 - pad_x : x2 - pad_x]
        if len(labels):
            lab = labels.copy()
            lab[:, [1, 3]] += pad_x
            lab[:, [2, 4]] += pad_y
            out_labels.append(lab)
            if points is not None:
                pts = points.copy()
                pts[..., 0] += pad_x
                pts[..., 1] += pad_y
                out_points.append(pts)
        hp, wp = h, w
    # crop a (2h, 2w) window starting at a random offset in [0, s)
    yc = int(rng.uniform(0, sh))
    xc = int(rng.uniform(0, sw))
    canvas = canvas[yc : yc + 2 * sh, xc : xc + 2 * sw]
    labels = np.concatenate(out_labels) if out_labels else np.zeros((0, 5), np.float32)
    points = np.concatenate(out_points) if out_points else None
    if points is not None and len(points) != len(labels):
        raise ValueError(
            f"mosaic9: {len(labels)} label rows vs {len(points)} point rows — "
            "every tile of a points task must carry a points array"
        )
    if has_points and points is None:
        points = np.zeros((0,) + _points_tail(items), np.float32)
    if len(labels):
        labels[:, [1, 3]] -= xc
        labels[:, [2, 4]] -= yc
        labels[:, 1:] = labels[:, 1:].clip(0, [sw * 2, sh * 2, sw * 2, sh * 2])
        wh = labels[:, 3:5] - labels[:, 1:3]
        keep = (wh > 2).all(1)
        labels = labels[keep]
        if points is not None:
            points = points.copy()
            points[..., 0] -= xc
            points[..., 1] -= yc
            points = points[keep]
    return canvas, labels, points


def copy_paste(
    img: np.ndarray,
    labels: np.ndarray,
    segments,
    rng: np.random.Generator,
    p: float = 0.5,
):
    """Instance copy-paste via horizontal mirror (reference augment.py:753
    ``CopyPaste``): flip selected instance masks left-right and paste them if
    the mirrored box doesn't occlude existing instances (IoA < 0.30).
    segments: per-instance polygons — (n, K, 2) array or list of (k_i, 2) —
    matching ``labels`` rows."""
    n = len(labels)
    if p == 0.0 or n == 0 or segments is None or len(segments) == 0:
        return img, labels, segments
    h, w = img.shape[:2]
    im_new = np.zeros(img.shape[:2], np.uint8)
    # mirrored candidate boxes
    boxes = labels[:, 1:5]
    flipped = boxes.copy()
    flipped[:, 0] = w - boxes[:, 2]
    flipped[:, 2] = w - boxes[:, 0]
    # intersection-over-area vs existing boxes
    lt = np.maximum(flipped[:, None, :2], boxes[None, :, :2])
    rb = np.minimum(flipped[:, None, 2:], boxes[None, :, 2:])
    inter = np.clip(rb - lt, 0, None).prod(-1)
    area = (flipped[:, 2] - flipped[:, 0]) * (flipped[:, 3] - flipped[:, 1]) + 1e-16
    ioa = inter / area[:, None]  # (n, n)
    candidates = np.nonzero((ioa < 0.30).all(1))[0]
    k = round(p * len(candidates))
    if k == 0:
        return img, labels, segments
    new_rows, new_segs = [], []
    for j in rng.choice(candidates, size=k, replace=False):
        seg = segments[j]
        seg_f = seg.copy()
        seg_f[:, 0] = w - seg[:, 0]
        new_rows.append(
            np.array([labels[j, 0], *flipped[j]], np.float32)
        )
        new_segs.append(seg_f)
        cv2.drawContours(im_new, [seg_f.astype(np.int32)], -1, 1, cv2.FILLED)
    result = cv2.flip(img, 1)  # mirrored source pixels
    i = im_new.astype(bool)
    img = img.copy()
    img[i] = result[i]
    labels = np.concatenate([labels, np.stack(new_rows)], 0)
    if isinstance(segments, np.ndarray):
        segments = np.concatenate([segments, np.stack(new_segs)], 0)
    else:
        segments = segments + new_segs
    return img, labels, segments


def random_perspective(
    img: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    degrees=0.0,
    translate=0.1,
    scale=0.5,
    shear=0.0,
    perspective=0.0,
    border: Tuple[int, int] = (0, 0),
    points: Optional[np.ndarray] = None,
    kind: Optional[str] = None,
):
    """Affine/perspective warp + box transform + candidate filter
    (reference augment.py:347 ``RandomPerspective``). Output size is the
    input canvas + 2*border (mosaic canvas 2s with border=-s/2 -> s).

    With ``points`` (n, P, D): point xy transform through the same M;
    kind="segments"/"corners" re-derive boxes from the warped point sets
    (clipped polygons for segments, corner extents for OBB — reference
    apply_segments), kind="keypoints" keeps box-corner boxes and zeroes the
    visibility of points warped out of frame (reference apply_keypoints)."""
    # output size comes from the INPUT canvas + border (the mosaic canvas is
    # 2s with border=-s/2 -> output s); round-3 fix: this used imgsz, which
    # left the host-mosaic path emitting 2s images (imgsz + 2*(-s/2) == 0 and
    # cv2 treats dsize=(0,0) as "keep source size")
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h
    M = T @ S @ R @ P @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    n = len(labels)
    if n:
        boxes = labels[:, 1:5]
        if points is not None and len(points):
            # warp the instance point sets through the same homography
            pxy = np.ones((*points.shape[:2], 3))
            pxy[..., :2] = points[..., :2]
            pxy = pxy @ M.T
            pxy = pxy[..., :2] / pxy[..., 2:3] if perspective else pxy[..., :2]
            points = points.copy()
            points[..., :2] = pxy.astype(np.float32)
        if kind == "segments" and points is not None and len(points):
            # boxes from the clipped warped polygons (apply_segments)
            points[..., 0] = points[..., 0].clip(0, w)
            points[..., 1] = points[..., 1].clip(0, h)
            new = np.concatenate(
                [points[..., :2].min(1), points[..., :2].max(1)], -1
            ).astype(np.float32)
            area_thr = 0.01
        elif kind == "corners" and points is not None and len(points):
            # boxes from the warped corner extents (unclipped corners keep
            # the rotated-rect geometry; clip only the derived aabb)
            new = np.concatenate(
                [points[..., :2].min(1), points[..., :2].max(1)], -1
            ).astype(np.float32)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
            area_thr = 0.01
        else:
            xy = np.ones((n * 4, 3))
            xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
            xy = xy @ M.T
            xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.concatenate(
                (x.min(1), y.min(1), x.max(1), y.max(1))
            ).reshape(4, n).T
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
            area_thr = 0.1
        if kind == "keypoints" and points is not None and len(points) and points.shape[-1] >= 3:
            # out-of-frame keypoints become invisible (apply_keypoints)
            oob = (
                (points[..., 0] < 0) | (points[..., 0] > w)
                | (points[..., 1] < 0) | (points[..., 1] > h)
            )
            points[..., 2] = np.where(oob, 0.0, points[..., 2])
        # candidate filter (augment.py:558 ``box_candidates``)
        w1 = boxes[:, 2] - boxes[:, 0]
        h1 = boxes[:, 3] - boxes[:, 1]
        w2 = new[:, 2] - new[:, 0]
        h2 = new[:, 3] - new[:, 1]
        ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
        keep = (
            (w2 > 2)
            & (h2 > 2)
            & (w2 * h2 / (w1 * h1 * s**2 + 1e-16) > area_thr)
            & (ar < 100)
        )
        labels = labels[keep]
        labels[:, 1:5] = new[keep]
        if points is not None and len(points):
            points = points[keep]
    return img, labels, points


def mixup(img1, labels1, img2, labels2, rng, points1=None, points2=None):
    """Beta(32,32) image blend (reference augment.py:326 ``MixUp``).
    points must be present on both sides or neither: label rows and point
    rows stay aligned row-for-row (silent misalignment would attach wrong
    polygons/keypoints downstream)."""
    if (points1 is None) != (points2 is None):
        raise ValueError(
            "mixup: points1/points2 must both be arrays or both None "
            "(labels and points are row-aligned)"
        )
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(np.uint8)
    labels = np.concatenate([labels1, labels2], 0)
    points = (
        np.concatenate([points1, points2], 0) if points1 is not None else None
    )
    return img, labels, points


def train_augment(
    get_item,
    index: int,
    n_items: int,
    rng: np.random.Generator,
    imgsz: Tuple[int, int],
    hyp: Dict[str, float],
    kind: Optional[str] = None,
    flip_idx=None,
):
    """The v8 train pipeline (reference augment.py:973 ``v8_transforms``):
    mosaic(p) -> copy_paste -> random_perspective(border=-s/2) -> [mixup(p)]
    -> hsv -> flip. ``get_item(i) -> (img, labels cls+xyxy px[, points])``
    loads raw samples; returns (img, labels, points) with points=None for
    plain detect. ``kind``/``flip_idx`` select the per-task point semantics
    (module docstring)."""
    sh, sw = imgsz

    def _warp(img, labels, points, border):
        # reference pre_transform order (augment.py:975-988): CopyPaste runs
        # BEFORE RandomPerspective, so pasted instances get warped too; it
        # only acts when instance polygons exist (`if p and len(segments)`),
        # i.e. the segments task — detect/pose/obb pass through.
        if kind == "segments":
            img, labels, points = copy_paste(
                img, labels, points, rng, p=hyp.get("copy_paste", 0.0)
            )
        return random_perspective(
            img, labels, rng,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.4), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0), border=border,
            points=points, kind=kind,
        )

    use_mosaic = rng.random() < hyp.get("mosaic", 1.0)
    if use_mosaic:
        if rng.random() < hyp.get("mosaic9", 0.0):
            idxs = [index] + [int(rng.integers(0, n_items)) for _ in range(8)]
            img, labels, points = mosaic9([get_item(i) for i in idxs], imgsz, rng)
        else:
            idxs = [index] + [int(rng.integers(0, n_items)) for _ in range(3)]
            img, labels, points = mosaic4([get_item(i) for i in idxs], imgsz, rng)
        border = (-sh // 2, -sw // 2)
    else:
        img, labels, points = _unpack_item(get_item(index))
        img, ratio, (dw, dh) = letterbox(img, (sh, sw))
        if len(labels):
            labels[:, [1, 3]] = labels[:, [1, 3]] * ratio + dw
            labels[:, [2, 4]] = labels[:, [2, 4]] * ratio + dh
            if points is not None:
                points = points.copy()
                points[..., 0] = points[..., 0] * ratio + dw
                points[..., 1] = points[..., 1] * ratio + dh
        border = (0, 0)
    img, labels, points = _warp(img, labels, points, border)
    if use_mosaic and rng.random() < hyp.get("mixup", 0.0):
        img2, labels2, points2 = mosaic4(
            [get_item(int(rng.integers(0, n_items))) for _ in range(4)], imgsz, rng
        )
        img2, labels2, points2 = _warp(img2, labels2, points2, (-sh // 2, -sw // 2))
        img, labels, points = mixup(img, labels, img2, labels2, rng, points, points2)
    img = albumentations_transform(img, rng, p=hyp.get("albumentations", 0.0))
    img = random_hsv(
        img, rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4)
    )
    img, labels, points = random_flip_ud(img, labels, rng, hyp.get("flipud", 0.0), points)
    img, labels, points, _ = random_flip_lr(
        img, labels, rng, hyp.get("fliplr", 0.5), points, kind=kind, flip_idx=flip_idx
    )
    return img, labels, points


_ALBU = None


def albumentations_transform(img: np.ndarray, rng: np.random.Generator, p: float = 0.0):
    """Gated Albumentations pixel-level augmentations (reference
    augment.py:819 ``Albumentations``: Blur/MedianBlur/ToGray/CLAHE at
    p=0.01 each). No-op when the package is absent or p == 0."""
    global _ALBU
    if p <= 0 or rng.random() >= p:
        return img
    if _ALBU is None:
        try:
            import albumentations as A

            _ALBU = A.Compose([
                A.Blur(p=0.01), A.MedianBlur(p=0.01),
                A.ToGray(p=0.01), A.CLAHE(p=0.01),
            ])
        except ImportError:
            _ALBU = False
    if _ALBU is False:
        return img
    return _ALBU(image=img)["image"]
