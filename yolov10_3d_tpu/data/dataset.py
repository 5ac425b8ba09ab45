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
    """images/... .jpg -> labels/... .txt — delegates to the canonical
    data/utils.img2label_paths (one mapping, reference rsplit-last
    semantics; this module used to keep a divergent copy)."""
    from .utils import img2label_paths

    return img2label_paths([img_path])[0]


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
        cache: Optional[str] = None,
        device_aug: bool = False,
        buffer_size: int = 32,
    ):
        """cache: None | 'ram' | 'disk' — decoded-image caching (reference
        base.py:184-224 ``cache_images``); label arrays are always cached to a
        ``*.cache.npz`` file with content-hash verification (reference
        dataset.py:43-149 ``cache_labels``)."""
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
        self.cache = cache
        self.device_aug = device_aug
        self._ram: List[Optional[np.ndarray]] = [None] * len(self.im_files)
        # mosaic partner buffer (reference base.py:86-87,147-182 ``buffer``):
        # partners sample from recently-decoded images instead of paying 3
        # fresh decodes per mosaic sample (decode dominates the host loader)
        from collections import deque

        self._buffer: "deque" = deque(maxlen=max(int(buffer_size), 0))
        self.labels = self._load_labels(Path(img_path))

    # -- label cache (reference dataset.py:43-149) --
    def _labels_hash(self) -> str:
        """Content hash over image+label paths, sizes and mtimes."""
        import hashlib

        h = hashlib.sha256()
        for f in self.im_files + self.label_files:
            p = Path(f)
            st = p.stat() if p.exists() else None
            h.update(f.encode())
            h.update(str((st.st_size, st.st_mtime_ns) if st else None).encode())
        return h.hexdigest()

    def _parse_label_file(self, i: int) -> np.ndarray:
        """(n, 5) cls + normalized xywh rows; malformed rows dropped with a
        warning (the reference's verify_image_label checks, data/utils.py)."""
        lp = Path(self.label_files[i])
        if not lp.exists():
            return np.zeros((0, 5), np.float32)
        rows = []
        for ln, line in enumerate(lp.read_text().splitlines()):
            vals = line.split()
            if not vals:
                continue
            if len(vals) < 5:
                from ..utils import LOGGER

                LOGGER.warning(f"{lp}:{ln + 1}: malformed label row {line!r} (skipped)")
                continue
            row = [float(v) for v in vals[:5]]
            if not all(0.0 <= v <= 1.0 for v in row[1:5]):
                row[1:5] = list(np.clip(row[1:5], 0.0, 1.0))
            rows.append(row)
        return np.array(rows, np.float32) if rows else np.zeros((0, 5), np.float32)

    def _load_labels(self, root: Path) -> List[np.ndarray]:
        cache_path = (root if root.is_dir() else root.parent) / "labels.cache.npz"
        want = self._labels_hash()
        try:
            z = np.load(cache_path, allow_pickle=False)
            if str(z["hash"]) == want and int(z["n"]) == len(self.im_files):
                return [z[f"l{i}"] for i in range(len(self.im_files))]
        except (FileNotFoundError, KeyError, ValueError, OSError):
            pass
        labels = [self._parse_label_file(i) for i in range(len(self.im_files))]
        try:
            np.savez_compressed(
                cache_path, hash=want, n=len(labels),
                **{f"l{i}": l for i, l in enumerate(labels)},
            )
        except OSError:  # read-only dataset dir: cache is best-effort
            pass
        return labels

    # -- image cache (reference base.py:184-224) --
    def _disk_cache_path(self, i: int) -> "Path":
        p = Path(self.im_files[i])
        return p.parent / (p.stem + ".npy")

    def _load_cached_image(self, i: int) -> np.ndarray:
        if self.cache == "ram":
            if self._ram[i] is None:
                self._ram[i] = _load_image(self.im_files[i])
            return self._ram[i]
        if self.cache == "disk":
            npy = self._disk_cache_path(i)
            if npy.exists():
                return np.load(npy, mmap_mode="r")
            img = _load_image(self.im_files[i])
            try:
                np.save(npy, img)
            except OSError:
                pass
            return img
        return _load_image(self.im_files[i])

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
        img = np.asarray(self._load_cached_image(i))
        h, w = img.shape[:2]
        lab = self.labels[i]
        if not len(lab):
            return img, np.zeros((0, 5), np.float32)
        cls = np.zeros_like(lab[:, 0]) if self.single_cls else lab[:, 0]
        cx, cy, bw, bh = lab[:, 1] * w, lab[:, 2] * h, lab[:, 3] * w, lab[:, 4] * h
        labels = np.stack(
            [cls, cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1
        ).astype(np.float32)
        return img, labels

    # -- per-instance point sets (segments/keypoints/obb corners) ----------
    # subclasses with instance geometry set points_kind and implement
    # _raw_points(i) -> (n, P, D) px aligned with _raw(i)'s label rows
    points_kind: Optional[str] = None
    flip_idx = None  # pose chiral-pair swap indices for fliplr

    def _raw_points(self, i: int):
        return None

    def _make_buffered_raw(self, primary: int):
        """_raw with mosaic-PARTNER buffering (reference base.py:147-182):
        the primary sample always loads fresh (epoch coverage is exact) and
        feeds the buffer; partner requests are served from the warm buffer —
        cutting the per-mosaic-sample decode count from 4 toward 1."""
        buf = self._buffer

        def get_item(i: int):
            if i != primary and buf.maxlen and len(buf) >= min(buf.maxlen, 4):
                img, labels, points = buf[int(self.rng.integers(len(buf)))]
                return img, labels.copy(), (None if points is None else points.copy())
            img, labels = self._raw(i)
            points = self._raw_points(i) if self.points_kind else None
            if buf.maxlen:
                buf.append((img, labels, points))
            return img, labels.copy(), (None if points is None else points.copy())

        return get_item

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        # device-aug tiles only while mosaic is active: close_mosaic() zeroes
        # hyp['mosaic'] and the loader falls back to the host path (plain img
        # batches; the train step skips its tile preprocess accordingly)
        if self.device_aug and self.augment and self.hyp.get("mosaic", 1.0) > 0:
            return self.tiles_item(i)
        if self.augment:
            img, labels, points = train_augment(
                self._make_buffered_raw(i), i, len(self), self.rng, self.imgsz,
                self.hyp, kind=self.points_kind, flip_idx=self.flip_idx,
            )
            out = self._format_detect(img, labels, i)
            if self.points_kind:
                self._format_points(out, labels, points, img.shape[:2])
            return out
        else:
            img, labels = self._raw(i)
            target = (
                tuple(self.rect_shapes[i]) if getattr(self, "rect_shapes", None) is not None
                else self.imgsz
            )
            img, ratio, (dw, dh) = letterbox(img, target, scaleup=False)
            if len(labels):
                labels = labels.copy()
                labels[:, [1, 3]] = labels[:, [1, 3]] * ratio + dw
                labels[:, [2, 4]] = labels[:, [2, 4]] * ratio + dh
        return self._format_detect(img, labels, i)

    def _format_detect(self, img: np.ndarray, labels: np.ndarray, i: int) -> Dict[str, np.ndarray]:
        """Pad (n, 5) cls+xyxy px labels to the fixed (M, ...) batch format."""
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
            # uint8: 4x fewer H2D bytes; consumers normalize on device
            "img": np.ascontiguousarray(img),
            "gt_labels": gt_labels,
            "gt_bboxes": gt_bboxes,
            "mask_gt": mask,
            "im_id": np.asarray(i, np.int64),  # index into self.im_files
        }

    def _format_points(self, out: Dict[str, np.ndarray], labels, points, img_hw) -> None:
        """Subclass hook: add task keys (gt_masks/gt_kpts/obb gt_bboxes) from
        the augmented per-instance point sets."""

    def close_mosaic(self):
        """Disable mosaic/mixup for the final epochs (reference trainer.py:365)."""
        self.hyp["mosaic"] = 0.0
        self.hyp["mixup"] = 0.0

    # -- device-aug mode: host only decodes tiles; mosaic/HSV/flip + label
    # transforms run inside the jitted train step (ops/device_aug.py) --
    def tiles_item(self, i: int) -> Dict[str, np.ndarray]:
        """One sample's 4 mosaic source tiles, letterboxed to imgsz, with
        per-tile labels in tile-frame pixels."""
        idxs = [i] + [int(self.rng.integers(0, len(self))) for _ in range(3)]
        th, tw = self.imgsz
        M = self.max_boxes
        tiles = np.zeros((4, th, tw, 3), np.uint8)
        tlab = np.zeros((4, M, 5), np.float32)
        tmask = np.zeros((4, M), bool)
        for t, j in enumerate(idxs):
            img, labels = self._raw(j)
            img, ratio, (dw, dh) = letterbox(img, (th, tw), scaleup=True)
            tiles[t] = img
            n = min(len(labels), M)
            if n:
                lab = labels[:n].copy()
                lab[:, [1, 3]] = lab[:, [1, 3]] * ratio + dw
                lab[:, [2, 4]] = lab[:, [2, 4]] * ratio + dh
                tlab[t, :n] = lab
                tmask[t, :n] = True
        return {"tiles": tiles, "tile_labels": tlab, "tile_mask": tmask}
    def image_shapes(self) -> np.ndarray:
        """(N, 2) h, w per image from headers (no full decode)."""
        if not hasattr(self, "_shapes"):
            from PIL import Image

            out = np.zeros((len(self.im_files), 2), np.int64)
            for i, f in enumerate(self.im_files):
                with Image.open(f) as im:
                    w, h = im.size
                out[i] = (h, w)
            self._shapes = out
        return self._shapes

    def set_rectangle(self, batch_size: int, stride: int = 32, pad: float = 0.0):
        """Sort images by aspect ratio and assign each BATCH one stride-
        aligned shape — the TPU-first rect mode: a handful of static shapes
        (one jit compile each) instead of per-image dynamic shapes."""
        shapes = self.image_shapes().astype(np.float64)
        ar = shapes[:, 0] / shapes[:, 1]  # h/w
        order = np.argsort(ar, kind="stable")
        self.im_files = [self.im_files[i] for i in order]
        self.label_files = [self.label_files[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        self._ram = [self._ram[i] for i in order]
        self._shapes = self._shapes[order]
        # task-dataset side channels are index-keyed dicts (segments/kpts/
        # corners); permute them too or masks/keypoints land on the wrong
        # images after the aspect-ratio sort (caught in review)
        for attr in ("_segments", "_kpts", "_corners"):
            d = getattr(self, attr, None)
            if isinstance(d, dict) and d:
                setattr(
                    self, attr,
                    {new: d[int(old)] for new, old in enumerate(order) if int(old) in d},
                )
        ar = ar[order]
        nb = int(np.ceil(len(ar) / batch_size))
        h0, w0 = self.imgsz
        self.rect_shapes = np.zeros((len(ar), 2), np.int64)
        for b in range(nb):
            sel = slice(b * batch_size, (b + 1) * batch_size)
            ari = ar[sel]
            mini, maxi = ari.min(), ari.max()
            shape = [1.0, 1.0]
            if maxi < 1:
                shape = [maxi, 1.0]
            elif mini > 1:
                shape = [1.0, 1.0 / mini]
            hw = np.ceil(np.array(shape) * np.array([h0, w0]) / stride + pad).astype(int) * stride
            self.rect_shapes[sel] = hw
        return self.rect_shapes


_CV2_LIMITED = False


def _limit_cv2_threads():
    """cv2 defaults to one internal thread-pool per core; under a threaded
    loader that oversubscribes the host (measured NEGATIVE scaling: 23
    img/s single-thread -> 12 img/s with 8 workers). The reference pins
    cv2 to single-threaded inside dataloader workers (utils/__init__.py
    NUM_THREADS + cv2.setNumThreads) — same fix here, applied once."""
    global _CV2_LIMITED
    if _CV2_LIMITED:
        return
    _CV2_LIMITED = True
    try:
        import cv2

        cv2.setNumThreads(0)
    except ImportError:
        pass


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
        rect: bool = False,
        multi_scale: bool = False,
        scale_choices: Sequence[float] = (0.75, 1.0, 1.25),
    ):
        """rect: aspect-ratio batch binning (reference base.py:226
        ``set_rectangle``) — TPU-first variant: batches are grouped by aspect
        bucket so each batch has ONE static shape, bounding jit recompiles to
        the bucket count instead of per-image shapes.

        multi_scale: per-batch random resize (reference detect/train.py:60-73)
        — TPU-first variant: scales come from a FIXED stride-aligned ladder so
        XLA compiles each of the few sizes exactly once."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.num_threads = max(1, int(num_threads))  # workers=0 == same-thread-ish
        self.rect = rect
        self.multi_scale = multi_scale
        self.scale_choices = tuple(scale_choices)
        self.epoch = 0

    def __len__(self):
        return len(self._batches())

    def _batches(self) -> List[np.ndarray]:
        """Per-batch index arrays. Batches are first-class here (not a flat
        array sliced in fixed strides): rect batches have a COMMON shape and
        a possibly-short tail, so shuffling/sharding must move whole batches
        or shards would mix rect shapes / mis-slice across the short batch
        (both caught in review)."""
        idx = np.arange(len(self.dataset))
        if self.rect and hasattr(self.dataset, "set_rectangle"):
            if getattr(self.dataset, "rect_shapes", None) is None:
                self.dataset.set_rectangle(self.batch_size)
            nb = math.ceil(len(idx) / self.batch_size)
            batches = [idx[b * self.batch_size : (b + 1) * self.batch_size]
                       for b in range(nb)]
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self.epoch)
                batches = [batches[i] for i in rng.permutation(len(batches))]
            batches = batches[self.shard_index :: self.num_shards]
        else:
            if self.shuffle:
                rng = np.random.default_rng(self.seed + self.epoch)
                rng.shuffle(idx)
            idx = idx[self.shard_index :: self.num_shards]
            nb = math.ceil(len(idx) / self.batch_size)
            batches = [idx[b * self.batch_size : (b + 1) * self.batch_size]
                       for b in range(nb)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return [b for b in batches if len(b)]

    def _batch_scale(self, b: int) -> float:
        """Deterministic per-batch scale from the fixed ladder."""
        if not self.multi_scale:
            return 1.0
        rng = np.random.default_rng((self.seed + self.epoch) * 100003 + b)
        return float(rng.choice(self.scale_choices))

    @staticmethod
    def _resize_batch(batch: Dict[str, np.ndarray], scale: float, stride: int = 32):
        if "img" not in batch:  # device-aug tile batches resize on device
            return batch
        """Resize the collated image batch by ``scale`` (stride-aligned).
        Normalized gt_bboxes are scale-invariant, so labels are untouched."""
        if scale == 1.0:
            return batch
        import cv2

        img = batch["img"]
        h, w = img.shape[1:3]
        nh = max(int(round(h * scale / stride)) * stride, stride)
        nw = max(int(round(w * scale / stride)) * stride, stride)
        if (nh, nw) == (h, w):
            return batch
        out = np.empty((img.shape[0], nh, nw, 3), img.dtype)
        for i in range(img.shape[0]):
            out[i] = cv2.resize(img[i], (nw, nh), interpolation=cv2.INTER_LINEAR)
        return {**batch, "img": out}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        _limit_cv2_threads()  # one cv2 thread per worker, not cores^2

        batches = self._batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def collate(batch_idx):
            items = list(self._pool.map(self.dataset.__getitem__, batch_idx))
            return {k: np.stack([it[k] for it in items]) for k in items[0]}

        def producer():
            try:
                for b, sel in enumerate(batches):
                    if stop.is_set() or len(sel) == 0:
                        return
                    batch = collate(sel)
                    if self.multi_scale:
                        batch = self._resize_batch(batch, self._batch_scale(b))
                    q.put(batch)
            except Exception:  # surface loader errors instead of a silent
                import traceback  # empty epoch (review finding)

                from ..utils import LOGGER

                LOGGER.error(f"DataLoader producer failed:\n{traceback.format_exc()}")
                raise
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
