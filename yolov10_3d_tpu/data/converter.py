"""Dataset converters (reference: data/converter.py — COCO91->80 mapping and
COCO-JSON -> YOLO-txt conversion)."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional


def coco91_to_coco80_class() -> List[Optional[int]]:
    """91-index (paper) -> 80-index (2014) class map (reference converter.py)."""
    x = [None] * 91
    idx80 = 0
    skip = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}  # 0-based removed ids
    for i in range(91):
        if i in skip:
            continue
        x[i] = idx80
        idx80 += 1
    return x


def convert_coco(
    labels_json: str,
    save_dir: str = "coco_converted",
    use_segments: bool = False,
    cls91to80: bool = True,
) -> str:
    """COCO instances json -> YOLO txt labels (reference converter.py
    ``convert_coco``). Returns the labels directory."""
    data = json.loads(Path(labels_json).read_text())
    out = Path(save_dir) / "labels"
    out.mkdir(parents=True, exist_ok=True)
    images = {im["id"]: im for im in data["images"]}
    anns = defaultdict(list)
    for a in data.get("annotations", []):
        anns[a["image_id"]].append(a)
    c91to80 = coco91_to_coco80_class()

    for img_id, im in images.items():
        w, h = im["width"], im["height"]
        lines = []
        for a in anns.get(img_id, []):
            if a.get("iscrowd", 0):
                continue
            box = a["bbox"]  # x, y, w, h
            cx = (box[0] + box[2] / 2) / w
            cy = (box[1] + box[3] / 2) / h
            bw = box[2] / w
            bh = box[3] / h
            if bw <= 0 or bh <= 0:
                continue
            cid = a["category_id"] - 1
            if cls91to80:
                mapped = c91to80[cid] if 0 <= cid < 91 else None
                if mapped is None:
                    continue
                cid = mapped
            parts = [str(cid), f"{cx:.6f}", f"{cy:.6f}", f"{bw:.6f}", f"{bh:.6f}"]
            if use_segments and a.get("segmentation"):
                seg = a["segmentation"][0]
                norm = [
                    f"{v / (w if i % 2 == 0 else h):.6f}" for i, v in enumerate(seg)
                ]
                parts = [str(cid)] + norm
            lines.append(" ".join(parts))
        stem = Path(im["file_name"]).stem
        (out / f"{stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
    return str(out)
