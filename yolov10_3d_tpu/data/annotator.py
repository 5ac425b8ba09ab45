"""Auto-annotation: detect with a YOLO model, segment the detections with SAM
box prompts, write YOLO-seg polygon labels (reference: data/annotator.py
``auto_annotate``)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def _mask_to_polygon(mask: np.ndarray, max_points: int = 200) -> np.ndarray:
    """Largest external contour of a binary mask as an (N, 2) polygon."""
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return np.zeros((0, 2), np.float32)
    c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
    if len(c) > max_points:
        c = c[:: len(c) // max_points + 1]
    return c


def auto_annotate(
    data: str,
    det_model,
    sam_predictor,
    output_dir: Optional[str] = None,
    conf: float = 0.25,
    exts: Sequence[str] = (".jpg", ".jpeg", ".png", ".bmp"),
) -> Path:
    """Annotate every image under `data` with YOLO-seg polygon labels.

    det_model: an engine Model facade (predict(source) -> [Results]) or any
    callable returning objects with `.boxes` (xyxy, cls arrays).
    sam_predictor: models.sam.SAMPredictor bound to a Sam + variables.
    Returns the label directory (reference annotator.py:8-50).
    """
    from PIL import Image

    data = Path(data)
    out = Path(output_dir or data.parent / f"{data.stem}_auto_annotate_labels")
    out.mkdir(parents=True, exist_ok=True)

    images = sorted(p for p in data.iterdir() if p.suffix.lower() in exts)
    for img_path in images:
        img = np.asarray(Image.open(img_path).convert("RGB"))
        h, w = img.shape[:2]
        results = det_model.predict(str(img_path), conf=conf)
        r = results[0] if isinstance(results, (list, tuple)) else results
        boxes = np.asarray(r.boxes.xyxy, np.float32)
        classes = np.asarray(r.boxes.cls, np.int32).reshape(-1)
        if len(boxes) == 0:
            (out / f"{img_path.stem}.txt").write_text("")
            continue

        sam_predictor.set_image(img)
        lines = []
        for cls_id, box in zip(classes, boxes):
            masks, scores = sam_predictor.prompt_inference(bboxes=box[None])
            m = masks[int(np.argmax(scores))] > sam_predictor.mask_threshold
            # mask logits are at encoder-resolution/4 over the letterboxed
            # square; map back to source pixels (top-left letterbox)
            s = sam_predictor.model.img_size
            r_scale = min(s / h, s / w)
            mh, mw = m.shape
            valid_h = max(int(round(h * r_scale / s * mh)), 1)
            valid_w = max(int(round(w * r_scale / s * mw)), 1)
            import cv2

            full = cv2.resize(
                m[:valid_h, :valid_w].astype(np.uint8), (w, h),
                interpolation=cv2.INTER_NEAREST,
            )
            poly = _mask_to_polygon(full)
            if len(poly) < 3:
                continue
            poly = poly / np.asarray([w, h], np.float32)  # normalized xy
            flat = " ".join(f"{v:.6f}" for v in poly.reshape(-1))
            lines.append(f"{int(cls_id)} {flat}")
        (out / f"{img_path.stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
    return out
