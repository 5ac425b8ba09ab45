"""YOLO-format detection dataset + loader (reference: data/base.py:21
``BaseDataset``, data/dataset.py:22 ``YOLODataset``, data/build.py:106
``build_dataloader``).

TPU-first differences from the reference: fixed-shape padded label tensors
(max_boxes per image) instead of ragged concat + batch_idx; a thread-pool
prefetching loader instead of torch DataLoader workers; per-host sharding via
(shard_index, num_shards) instead of DistributedSampler.
"""

from __future__ import annotations

import math
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from .augment import train_augment
from .preprocess import letterbox

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def img2label_path(img_path: str) -> str:
    """images/... .jpg -> labels/... .txt (reference data/utils.py)."""
    sa, sb = f"{Path(img_path).parent.name}", ""
    p = Path(img_path)
    parts = list(p.parts)
    for i, seg in enumerate(parts):
        if seg == "images":
            parts[i] = "labels"
    return str(Path(*parts).with_suffix(".txt"))


def _load_image(path: str) -> np.ndarray:
    try:
        import cv2

        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


class YOLODataset:
    """Detection dataset over YOLO-format labels.

    root: directory of images (or a txt file listing image paths).
    Produces padded batches: img (B,H,W,3) fp32 [0,1], gt_labels (B,M),
    gt_bboxes (B,M,4) normalized xywh, mask_gt (B,M).
    """

    def __init__(
        self,
        img_path: Union[str, Path],
        imgsz: Union[int, Tuple[int, int]] = 640,
        augment: bool = False,
        hyp: Optional[Dict] = None,
        max_boxes: int = 100,
        fraction: float = 1.0,
        single_cls: bool = False,
        seed: int = 0,
    ):
        self.imgsz = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
        self.augment = augment
        self.hyp = dict(hyp or {})
        self.max_boxes = max_boxes
        self.single_cls = single_cls
        self.rng = np.random.default_rng(seed)
        self.im_files = self._scan(img_path)
        if fraction < 1.0:
            self.im_files = self.im_files[: max(1, round(len(self.im_files) * fraction))]
        self.label_files = [img2label_path(f) for f in self.im_files]

    @staticmethod
    def _scan(img_path) -> List[str]:
        p = Path(img_path)
        if p.is_file() and p.suffix == ".txt":
            lines = [l.strip() for l in p.read_text().splitlines() if l.strip()]
            return [str((p.parent / l).resolve()) if not Path(l).is_absolute() else l for l in lines]
        if p.is_dir():
            files = sorted(
                str(f) for f in p.rglob("*") if f.suffix[1:].lower() in IMG_FORMATS
            )
            if not files:
                raise FileNotFoundError(f"no images found under {p}")
            return files
        raise FileNotFoundError(f"invalid dataset path {img_path}")

    def __len__(self):
        return len(self.im_files)

    def _raw(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """(img HWC RGB uint8, labels (n,5) cls+xyxy px)."""
        img = _load_image(self.im_files[i])
        h, w = img.shape[:2]
        lp = Path(self.label_files[i])
        labels = np.zeros((0, 5), np.float32)
        if lp.exists():
            rows = []
            for line in lp.read_text().splitlines():
                vals = line.split()
                if len(vals) >= 5:
                    c = float(vals[0])
                    cx, cy, bw, bh = (float(v) for v in vals[1:5])
                    rows.append(
                        [0.0 if self.single_cls else c,
                         (cx - bw / 2) * w, (cy - bh / 2) * h,
                         (cx + bw / 2) * w, (cy + bh / 2) * h]
                    )
            if rows:
                labels = np.array(rows, np.float32)
        return img, labels

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.augment:
            img, labels = train_augment(
                self._raw, i, len(self), self.rng, self.imgsz, self.hyp
            )
        else:
            img, labels = self._raw(i)
            img, ratio, (dw, dh) = letterbox(img, self.imgsz, scaleup=False)
            if len(labels):
                labels = labels.copy()
                labels[:, [1, 3]] = labels[:, [1, 3]] * ratio + dw
                labels[:, [2, 4]] = labels[:, [2, 4]] * ratio + dh
        h, w = img.shape[:2]
        M = self.max_boxes
        gt_labels = np.zeros((M,), np.int32)
        gt_bboxes = np.zeros((M, 4), np.float32)
        mask = np.zeros((M,), bool)
        n = min(len(labels), M)
        if n:
            lab = labels[:n]
            gt_labels[:n] = lab[:, 0].astype(np.int32)
            xyxy = lab[:, 1:5]
            xywh = np.concatenate(
                [(xyxy[:, :2] + xyxy[:, 2:]) / 2, xyxy[:, 2:] - xyxy[:, :2]], -1
            )
            gt_bboxes[:n] = xywh / np.array([w, h, w, h], np.float32)
            mask[:n] = (xywh[:, 2] > 1) & (xywh[:, 3] > 1)
        return {
            "img": img.astype(np.float32) / 255.0,
            "gt_labels": gt_labels,
            "gt_bboxes": gt_bboxes,
            "mask_gt": mask,
        }

    def close_mosaic(self):
        """Disable mosaic/mixup for the final epochs (reference trainer.py:365)."""
        self.hyp["mosaic"] = 0.0
        self.hyp["mixup"] = 0.0


class DataLoader:
    """Thread-prefetching batching loader with per-host sharding.

    Replaces torch's InfiniteDataLoader + DistributedSampler (reference
    build.py:29,106): each host iterates its own shard; device placement and
    cross-host semantics are handled by the jit-sharded train step.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_index :: self.num_shards]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        idx = self._indices()
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def collate(batch_idx):
            items = list(self._pool.map(self.dataset.__getitem__, batch_idx))
            return {k: np.stack([it[k] for it in items]) for k in items[0]}

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    if len(sel) < self.batch_size and self.drop_last:
                        break
                    q.put(collate(sel))
            finally:
                q.put(None)

        self._pool = ThreadPoolExecutor(max_workers=self.num_threads)
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            self._pool.shutdown(wait=False)
        self.epoch += 1
