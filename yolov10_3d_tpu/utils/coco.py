"""COCO-json detection evaluation (reference: models/yolo/detect/val.py:276-300
``pred_to_json``/``eval_json`` which call pycocotools).

pycocotools is a C extension unavailable offline; this module implements the
same protocol in vectorized numpy: per-category greedy matching at 10 IoU
thresholds, 101-point interpolated AP, area ranges all/small/medium/large,
maxDets=100. Checked against our own DetMetrics machinery in
tests/test_coco_eval.py (the two protocols agree within interpolation
tolerance).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def xyxy_to_coco(box: np.ndarray) -> np.ndarray:
    """xyxy -> COCO xywh (top-left)."""
    out = box.copy().astype(np.float64)
    out[..., 2] = box[..., 2] - box[..., 0]
    out[..., 3] = box[..., 3] - box[..., 1]
    return out


def pred_to_json(
    image_id: Union[int, str], boxes_xyxy: np.ndarray, scores: np.ndarray,
    classes: np.ndarray, class_map: Optional[Dict[int, int]] = None,
) -> List[Dict]:
    """One image's detections -> COCO result dicts (reference
    detect/val.py:276 ``pred_to_json``)."""
    out = []
    xywh = xyxy_to_coco(np.asarray(boxes_xyxy))
    for b, s, c in zip(xywh, np.asarray(scores), np.asarray(classes)):
        cid = int(c)
        out.append(
            {
                "image_id": image_id,
                "category_id": class_map.get(cid, cid) if class_map else cid,
                "bbox": [round(float(v), 3) for v in b],
                "score": round(float(s), 5),
            }
        )
    return out


def save_json(records: List[Dict], path: Union[str, Path]) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(records))
    return str(path)


def _iou_xywh(gt: np.ndarray, dt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """(G,4),(D,4) COCO xywh -> (D,G) IoU; crowd GTs use intersection/det-area
    (pycocotools ``iou`` semantics)."""
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    ix = np.clip(np.minimum(dx2[:, None], gx2[None]) - np.maximum(dx1[:, None], gx1[None]), 0, None)
    iy = np.clip(np.minimum(dy2[:, None], gy2[None]) - np.maximum(dy1[:, None], gy1[None]), 0, None)
    inter = ix * iy
    d_area = (dt[:, 2] * dt[:, 3])[:, None]
    g_area = (gt[:, 2] * gt[:, 3])[None]
    union = np.where(iscrowd[None], d_area, d_area + g_area - inter)
    return inter / np.maximum(union, 1e-10)


class COCOEvaluator:
    """COCO detection mAP (bbox) on json records.

    gt: COCO annotations dict (or path) with 'annotations' (+optional
    'images'/'categories'); dt: list of result dicts (or path).
    """

    def __init__(
        self,
        gt: Union[str, Path, Dict],
        dt: Union[str, Path, List[Dict]],
        max_dets: int = 100,
        iou_thrs: Optional[Sequence[float]] = None,
    ):
        if isinstance(gt, (str, Path)):
            gt = json.loads(Path(gt).read_text())
        if isinstance(dt, (str, Path)):
            dt = json.loads(Path(dt).read_text())
        self.iou_thrs = np.asarray(iou_thrs if iou_thrs is not None else np.linspace(0.5, 0.95, 10))
        self.max_dets = max_dets
        anns = gt["annotations"] if isinstance(gt, dict) else gt
        self.gts = defaultdict(list)
        self.cat_ids = set()
        self.img_ids = set()
        for a in anns:
            self.gts[(a["image_id"], a["category_id"])].append(a)
            self.cat_ids.add(a["category_id"])
            self.img_ids.add(a["image_id"])
        self.dts = defaultdict(list)
        for d in dt:
            self.dts[(d["image_id"], d["category_id"])].append(d)
            self.cat_ids.add(d["category_id"])
            self.img_ids.add(d["image_id"])
        if isinstance(gt, dict) and gt.get("images"):
            self.img_ids.update(im["id"] for im in gt["images"])

    def _evaluate_img(self, img_id, cat_id, area_rng):
        gts = self.gts.get((img_id, cat_id), [])
        dts = sorted(
            self.dts.get((img_id, cat_id), []), key=lambda d: -d["score"]
        )[: self.max_dets]
        if not gts and not dts:
            return None
        g_boxes = np.array([g["bbox"] for g in gts], np.float64).reshape(-1, 4)
        g_crowd = np.array([bool(g.get("iscrowd", 0)) for g in gts], dtype=bool)
        g_area = np.array(
            [g.get("area", g["bbox"][2] * g["bbox"][3]) for g in gts], dtype=np.float64
        )
        g_ignore = g_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])
        # sort gts: non-ignored first (pycocotools gtind)
        order = np.argsort(g_ignore, kind="stable")
        g_boxes, g_crowd, g_ignore = g_boxes[order], g_crowd[order], g_ignore[order]

        d_boxes = np.array([d["bbox"] for d in dts], np.float64).reshape(-1, 4)
        d_scores = np.array([d["score"] for d in dts], np.float64)
        D, G, T = len(dts), len(gts), len(self.iou_thrs)
        ious = _iou_xywh(g_boxes, d_boxes, g_crowd) if D and G else np.zeros((D, G))

        dt_m = np.zeros((T, D), dtype=np.int64) - 1  # matched gt index or -1
        gt_m = np.zeros((T, G), dtype=np.int64) - 1
        for t, thr in enumerate(self.iou_thrs):
            for di in range(D):
                best, m = min(thr, 1 - 1e-10), -1
                for gi in range(G):
                    if gt_m[t, gi] >= 0 and not g_crowd[gi]:
                        continue
                    # stop at ignored gts once a real match was found
                    if m > -1 and not g_ignore[m] and g_ignore[gi]:
                        break
                    if ious[di, gi] < best:
                        continue
                    best, m = ious[di, gi], gi
                if m == -1:
                    continue
                dt_m[t, di] = m
                gt_m[t, m] = di
        d_area = d_boxes[:, 2] * d_boxes[:, 3]
        d_out_of_rng = (d_area < area_rng[0]) | (d_area > area_rng[1])
        dt_ignore = np.zeros((T, D), bool)
        for t in range(T):
            matched_ign = np.array(
                [g_ignore[m] if m >= 0 else False for m in dt_m[t]], bool
            )
            dt_ignore[t] = matched_ign | ((dt_m[t] < 0) & d_out_of_rng)
        return {
            "dt_matches": dt_m >= 0,
            "dt_ignore": dt_ignore,
            "dt_scores": d_scores,
            "num_gt": int((~g_ignore).sum()),
        }

    def _accumulate_cat(self, cat_id, area: str = "all"):
        rng = AREA_RNG[area]
        evals = [self._evaluate_img(i, cat_id, rng) for i in sorted(self.img_ids, key=str)]
        evals = [e for e in evals if e is not None]
        if not evals:
            return None
        scores = np.concatenate([e["dt_scores"] for e in evals])
        matches = np.concatenate([e["dt_matches"] for e in evals], axis=1)
        ignores = np.concatenate([e["dt_ignore"] for e in evals], axis=1)
        npig = sum(e["num_gt"] for e in evals)
        if npig == 0:
            return None
        order = np.argsort(-scores, kind="mergesort")
        matches, ignores = matches[:, order], ignores[:, order]
        tps = matches & ~ignores
        fps = ~matches & ~ignores
        T = len(self.iou_thrs)
        ap = np.zeros(T)
        recall_101 = np.linspace(0, 1, 101)
        for t in range(T):
            tp = np.cumsum(tps[t]).astype(np.float64)
            fp = np.cumsum(fps[t]).astype(np.float64)
            rc = tp / npig
            pr = tp / np.maximum(tp + fp, 1e-10)
            # precision envelope (pycocotools accumulate)
            for i in range(len(pr) - 1, 0, -1):
                pr[i - 1] = max(pr[i - 1], pr[i])
            idx = np.searchsorted(rc, recall_101, side="left")
            q = np.where(idx < len(pr), pr[np.clip(idx, 0, max(len(pr) - 1, 0))], 0.0)
            ap[t] = q.mean()
        return ap

    def evaluate(self) -> Dict[str, float]:
        """Returns the headline COCO numbers: mAP50-95 ('map'), mAP50, mAP75,
        and area-split APs."""
        out = {}
        for area in ("all", "small", "medium", "large"):
            aps = [self._accumulate_cat(c, area) for c in sorted(self.cat_ids)]
            aps = [a for a in aps if a is not None]
            if not aps:
                mean = np.zeros(len(self.iou_thrs))
            else:
                mean = np.mean(aps, axis=0)
            if area == "all":
                out["map"] = float(mean.mean())
                out["map50"] = float(mean[0])
                out["map75"] = float(mean[5]) if len(mean) > 5 else 0.0
            else:
                out[f"map_{area}"] = float(mean.mean())
        return out
