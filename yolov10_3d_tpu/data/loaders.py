"""Inference sources (reference: data/loaders.py ``LoadStreams``:33,
``LoadScreenshots``:186, ``LoadImagesAndVideos``:251, ``LoadPilAndNumpy``:386,
``LoadTensor``:441).

Files/dirs/globs/arrays are handled by ``engine.predictor.load_source``; this
module adds the *streaming* sources: threaded webcam/RTSP/video streams,
screenshots, and pre-made tensors. All frames are HWC RGB uint8 numpy.
"""

from __future__ import annotations

import math
import threading
import time
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

STREAM_PREFIXES = ("rtsp://", "rtmp://", "http://", "https://", "tcp://")


def is_stream_source(source) -> bool:
    """webcam index, 'N' digit string, *.streams list file, or a URL."""
    if isinstance(source, int):
        return True
    if isinstance(source, str):
        s = source.strip().lower()
        return s.isdigit() or s.startswith(STREAM_PREFIXES) or s.endswith(".streams")
    return False


class LoadStreams:
    """Threaded multi-stream frame reader (reference loaders.py:33-183).

    Each source gets a daemon reader thread. ``buffer=True`` keeps every
    frame (bounded queue, for video files); ``buffer=False`` keeps only the
    most recent frame (live-camera semantics). Iteration yields
    ``(paths, frames)`` lists, one entry per source, RGB uint8.
    """

    def __init__(
        self,
        sources: Union[str, int, Sequence],
        vid_stride: int = 1,
        buffer: bool = False,
        max_buffer: int = 30,
    ):
        import cv2

        self.buffer = buffer
        self.max_buffer = max_buffer
        self.vid_stride = vid_stride
        self.running = True
        if isinstance(sources, (str, Path)) and str(sources).endswith(".streams"):
            sources = [s.strip() for s in Path(sources).read_text().splitlines() if s.strip()]
        elif not isinstance(sources, (list, tuple)):
            sources = [sources]
        self.sources = [str(s) for s in sources]
        n = len(self.sources)
        self.caps: List = [None] * n
        self.frames: List[List[np.ndarray]] = [[] for _ in range(n)]
        self.locks = [threading.Lock() for _ in range(n)]
        self.fps = [0.0] * n
        self.threads: List[threading.Thread] = []
        for i, s in enumerate(self.sources):
            src = int(s) if s.isdigit() else s
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s!r}")
            self.caps[i] = cap
            self.fps[i] = max(cap.get(cv2.CAP_PROP_FPS) or 0, 0) or 30.0
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int):
        import cv2

        cap = self.caps[i]
        n = 0
        while self.running and cap.isOpened():
            # latest-frame mode: drop stale frames instead of blocking
            if not self.buffer and len(self.frames[i]) >= 1:
                time.sleep(1 / max(self.fps[i], 1))
            ok = cap.grab()
            n += 1
            if not ok:
                break
            if n % self.vid_stride:
                continue
            ok, im = cap.retrieve()
            if not ok:
                break
            im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
            if self.buffer:
                # keep-every-frame contract (video files): BLOCK until the
                # consumer drains instead of dropping the oldest frame
                # (review finding; the reference reader blocks the same way)
                while self.running:
                    with self.locks[i]:
                        if len(self.frames[i]) < self.max_buffer:
                            self.frames[i].append(im)
                            break
                    time.sleep(0.005)
            else:
                with self.locks[i]:
                    self.frames[i] = [im]
        with self.locks[i]:
            self.frames[i].append(None)  # end-of-stream sentinel

    def __iter__(self) -> Iterator[Tuple[List[str], List[np.ndarray]]]:
        ended = [False] * len(self.sources)
        while self.running and not all(ended):
            paths, imgs = [], []
            for i in range(len(self.sources)):
                if ended[i]:
                    continue
                frame = None
                popped = False
                for _ in range(1000):  # wait up to ~5s for a frame
                    with self.locks[i]:
                        if self.frames[i]:
                            frame = self.frames[i].pop(0)
                            popped = True
                            break
                    if not self.threads[i].is_alive():
                        break
                    time.sleep(0.005)
                if popped and frame is None:  # reader's end-of-stream sentinel
                    ended[i] = True
                    continue
                if frame is None:
                    if not self.threads[i].is_alive():
                        ended[i] = True  # reader died with no sentinel
                    # else: transient stall on a LIVE source (network jitter)
                    # — skip this round, try again next loop instead of
                    # permanently dropping the stream (caught in review)
                    continue
                paths.append(f"{self.sources[i]}")
                imgs.append(frame)
            if imgs:
                yield paths, imgs
        self.close()

    def __len__(self):
        return len(self.sources)

    def close(self):
        self.running = False
        for t in self.threads:
            if t.is_alive():
                t.join(timeout=1.0)
        for cap in self.caps:
            if cap is not None:
                cap.release()


class LoadScreenshots:
    """Screen-capture source via mss (reference loaders.py:186-248).
    source: 'screen' or 'screen N [left top width height]'."""

    def __init__(self, source: str = "screen"):
        try:
            import mss  # optional dependency, like the reference
        except ImportError as e:  # pragma: no cover
            raise ImportError("screenshot source requires `mss`") from e
        parts = str(source).split()[1:]
        self.screen = int(parts[0]) if parts else 0
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen]
        self.monitor = {
            "left": int(parts[1]) if len(parts) > 1 else mon["left"],
            "top": int(parts[2]) if len(parts) > 2 else mon["top"],
            "width": int(parts[3]) if len(parts) > 3 else mon["width"],
            "height": int(parts[4]) if len(parts) > 4 else mon["height"],
        }
        self.frame = 0

    def __iter__(self):
        while True:
            im = np.asarray(self.sct.grab(self.monitor))[..., :3][..., ::-1]  # BGRA->RGB
            self.frame += 1
            yield [f"screen{self.screen}_{self.frame}"], [np.ascontiguousarray(im)]


class LoadTensor:
    """Pre-made tensor source (reference loaders.py:441-500): numpy/jax/torch
    array, HWC or BHWC (RGB) or BCHW float in [0,1] / uint8."""

    def __init__(self, tensor):
        arr = np.asarray(tensor)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4:
            raise ValueError(f"tensor source must be 3D/4D, got shape {arr.shape}")
        if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):  # BCHW -> BHWC
            arr = arr.transpose(0, 2, 3, 1)
        if arr.dtype != np.uint8:
            if arr.max() > 1.001:
                raise ValueError(
                    "float tensor source must be normalized to [0,1] "
                    f"(max={float(arr.max()):.3f})"
                )
            arr = (arr * 255).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, -1)
        self.arr = arr

    def __iter__(self):
        for i, im in enumerate(self.arr):
            yield f"tensor{i}", im
