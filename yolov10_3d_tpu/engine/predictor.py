"""Streaming predictor (reference: engine/predictor.py ``BasePredictor`` +
models/yolov10/predict.py).

Pipeline: source -> letterbox batch -> jitted forward+decode+top-k (fixed
shapes, compiled once per input shape) -> host unpad + scale to original
coords -> Results.
"""

from __future__ import annotations

import functools
import glob
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocess import preprocess_batch
from ..ops.postprocess import v10_detections, decode_detect3d, v10_3d_postprocess
from .results import Results

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}
VID_FORMATS = {"avi", "mkv", "mov", "mp4", "mpeg", "mpg", "webm"}


def load_source(source) -> Iterator:
    """Yield (path, HWC RGB uint8) frames from path/dir/glob/ndarray/PIL/
    tensor/list/screenshot sources (reference data/loaders.py source types).
    Live streams (webcam/RTSP) are handled by ``Predictor.stream``."""
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from load_source(s)
        return
    if isinstance(source, np.ndarray) and source.ndim == 3 and source.dtype == np.uint8:
        yield "array", source
        return
    if hasattr(source, "ndim") and getattr(source, "ndim", 0) in (3, 4):
        # 4D batches, CHW layouts, float tensors, jax/torch arrays
        from ..data.loaders import LoadTensor

        yield from LoadTensor(source)
        return
    if isinstance(source, str) and source.startswith("screen"):
        from ..data.loaders import LoadScreenshots

        for paths, imgs in LoadScreenshots(source):
            yield paths[0], imgs[0]
        return
    if hasattr(source, "convert"):  # PIL
        yield "pil", np.asarray(source.convert("RGB"))
        return
    p = str(source)
    path = Path(p)
    if path.is_dir():
        for f in sorted(path.rglob("*")):
            if f.suffix[1:].lower() in IMG_FORMATS:
                yield from load_source(str(f))
        return
    if "*" in p:
        for f in sorted(glob.glob(p, recursive=True)):
            yield from load_source(f)
        return
    suffix = path.suffix[1:].lower()
    if suffix in VID_FORMATS:
        import cv2

        cap = cv2.VideoCapture(p)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"{p}#{i}", cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            i += 1
        cap.release()
        return
    if suffix in IMG_FORMATS:
        try:
            import cv2

            im = cv2.imread(p)
            if im is None:
                raise FileNotFoundError(p)
            yield p, cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        except ImportError:  # pragma: no cover
            from PIL import Image

            yield p, np.asarray(Image.open(p).convert("RGB"))
        return
    raise FileNotFoundError(f"unsupported source: {source!r}")


def _scale_boxes_np(boxes, from_shape, to_shape):
    gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
    pad_w = round((from_shape[1] - to_shape[1] * gain) / 2 - 0.1)
    pad_h = round((from_shape[0] - to_shape[0] * gain) / 2 - 0.1)
    boxes = boxes - np.array([pad_w, pad_h, pad_w, pad_h])
    boxes = boxes / gain
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, to_shape[1])
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, to_shape[0])
    return boxes


class Predictor:
    """NMS-free detection predictor."""

    def __init__(self, model, spec, variables, args, names=None):
        self.model = model
        self.spec = spec
        self.variables = variables
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}
        self.task3d = spec.head_module == "v10Detect3d"

    @functools.lru_cache(maxsize=8)
    def _forward_fn(self, max_det: int):
        spec = self.spec

        if self.task3d:
            @jax.jit
            def fwd(variables, x):
                x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
                feats = self.model.apply(variables, x, train=False)["one2one"]
                nl = len(feats)
                preds = decode_detect3d(feats, spec.strides[:nl], spec.nc)
                reg, scores, labels = v10_3d_postprocess(preds, max_det, spec.nc)
                return reg, jax.nn.sigmoid(scores), labels
        else:
            @jax.jit
            def fwd(variables, x):
                x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
                feats = self.model.apply(variables, x, train=False)["one2one"]
                det = v10_detections(feats, spec.strides, spec.nc, max_det=max_det)
                return det["boxes"], det["scores"], det["labels"]

        return fwd

    @functools.lru_cache(maxsize=8)
    def _device_preprocess_fn(self, out_hw: tuple):
        """uint8 H2D + fused device letterbox (+/255) — the BASELINE.json
        north-star serving path (ops/pallas_preprocess.serve_preprocess)."""
        from ..ops.pallas_preprocess import serve_preprocess

        @jax.jit
        def prep(imgs_u8):
            x = serve_preprocess(imgs_u8, out_hw)
            return x

        return prep

    def _resolve(self, conf, max_det, imgsz):
        from ..utils.checks import check_imgsz

        conf = conf if conf is not None else (self.args.get("conf") or 0.25)
        max_det = max_det or self.args.get("max_det") or (50 if self.task3d else 300)
        imgsz = check_imgsz(
            imgsz or self.args.get("imgsz") or 640, stride=max(self.spec.strides)
        )
        return conf, max_det, imgsz

    def _process_chunk(self, chunk, fwd, conf, classes, imgsz) -> List[Results]:
        """Preprocess a list of (path, img) frames, run the jitted forward, and
        unpad/scale the detections back to original coordinates.

        Same-shape chunks take the device path: uint8 H2D (4x fewer bytes)
        + fused on-device letterbox/normalize; mixed shapes letterbox on host.
        """
        shape = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
        imgs = [f[1] for f in chunk]
        uniform = (
            self.args is None or self.args.get("device_preprocess", True)
        ) and len({im.shape for im in imgs}) == 1 and imgs[0].dtype == np.uint8
        t0 = time.perf_counter()
        if uniform:
            x = self._device_preprocess_fn(tuple(shape))(
                jnp.asarray(np.stack(imgs))
            )
            model_hw = tuple(shape)
        else:
            batch, _ = preprocess_batch(imgs, imgsz)
            x = jnp.asarray(batch)
            model_hw = batch.shape[1:3]
        t1 = time.perf_counter()
        out = fwd(self.variables, x)
        boxes_or_reg, scores, labels = (np.asarray(o) for o in out)
        t2 = time.perf_counter()
        results = []
        for j, (path, img) in enumerate(chunk):
            keep = scores[j] > conf
            if classes is not None:
                keep &= np.isin(labels[j], np.asarray(classes))
            if self.task3d:
                reg = boxes_or_reg[j][keep]
                b = _scale_boxes_np(reg[:, :4], model_hw, img.shape[:2])
                det = np.concatenate(
                    [b, scores[j][keep, None], labels[j][keep, None]], -1
                )
                res = Results(
                    img, path=path, names=self.names, boxes=det,
                    boxes3d=np.concatenate([det, reg[:, 4:6], reg[:, 6:9],
                                            np.zeros((len(b), 4), np.float32),
                                            reg[:, -1:],], -1)[:, :16],
                )
            else:
                b = _scale_boxes_np(boxes_or_reg[j][keep], model_hw, img.shape[:2])
                det = np.concatenate(
                    [b, scores[j][keep, None], labels[j][keep, None]], -1
                )
                res = Results(img, path=path, names=self.names, boxes=det)
            res.speed = {
                "preprocess": (t1 - t0) / len(chunk) * 1e3,
                "inference": (t2 - t1) / len(chunk) * 1e3,
            }
            results.append(res)
        return results

    def __call__(
        self,
        source,
        batch_size: int = 1,
        conf: Optional[float] = None,
        max_det: Optional[int] = None,
        imgsz=None,
        classes: Optional[Sequence[int]] = None,
    ) -> List[Results]:
        from ..data.loaders import is_stream_source

        if is_stream_source(source):
            return list(
                self.stream(source, conf=conf, max_det=max_det, imgsz=imgsz, classes=classes)
            )
        conf, max_det, imgsz = self._resolve(conf, max_det, imgsz)
        fwd = self._forward_fn(int(max_det))
        results = []
        frames = list(load_source(source))
        for i in range(0, len(frames), batch_size):
            results.extend(
                self._process_chunk(frames[i : i + batch_size], fwd, conf, classes, imgsz)
            )
        return results

    def stream(
        self,
        source,
        conf: Optional[float] = None,
        max_det: Optional[int] = None,
        imgsz=None,
        classes: Optional[Sequence[int]] = None,
        vid_stride: int = 1,
    ) -> Iterator[Results]:
        """Generator mode (reference predictor.py:208 ``stream_inference``):
        Results are yielded as frames arrive. Live sources (webcam index,
        RTSP/HTTP URLs, .streams files) run through the threaded LoadStreams
        reader; everything else streams frame-by-frame from load_source."""
        from ..data.loaders import LoadStreams, is_stream_source

        conf, max_det, imgsz = self._resolve(conf, max_det, imgsz)
        fwd = self._forward_fn(int(max_det))
        if is_stream_source(source):
            streams = LoadStreams(
                source, vid_stride=vid_stride,
                buffer=bool(self.args.get("stream_buffer", False)),
            )
            try:
                for paths, imgs in streams:
                    yield from self._process_chunk(
                        list(zip(paths, imgs)), fwd, conf, classes, imgsz
                    )
            finally:
                streams.close()
        else:
            for frame in load_source(source):
                yield from self._process_chunk([frame], fwd, conf, classes, imgsz)
