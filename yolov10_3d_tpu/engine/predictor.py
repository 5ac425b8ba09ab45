"""Streaming predictor (reference: engine/predictor.py ``BasePredictor`` +
models/yolov10/predict.py).

Pipeline: source -> letterbox batch -> jitted forward+decode+top-k (fixed
shapes, compiled once per input shape) -> host unpad + scale to original
coords -> Results.
"""

from __future__ import annotations

import functools
import glob
import re
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
    if isinstance(source, str) and re.fullmatch(r"screen\d*", source):
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


def _letterbox_geom(from_shape, to_shape):
    gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
    pad_w = round((from_shape[1] - to_shape[1] * gain) / 2 - 0.1)
    pad_h = round((from_shape[0] - to_shape[0] * gain) / 2 - 0.1)
    return gain, pad_w, pad_h


def _scale_kpts_np(kpts, from_shape, to_shape):
    """(N, nk, 2|3) letterboxed-pixel keypoints -> original coords
    (reference ops.py ``scale_coords``)."""
    gain, pad_w, pad_h = _letterbox_geom(from_shape, to_shape)
    kpts = kpts.copy()
    kpts[..., 0] = ((kpts[..., 0] - pad_w) / gain).clip(0, to_shape[1])
    kpts[..., 1] = ((kpts[..., 1] - pad_h) / gain).clip(0, to_shape[0])
    return kpts


def _scale_masks_np(masks, from_shape, to_shape):
    """(N, hm, wm) proto-resolution masks (relative to the letterboxed
    from_shape) -> (N, oh, ow) at original resolution (reference
    ops.py:700 ``scale_masks``; nearest resize)."""
    if len(masks) == 0:
        return np.zeros((0, *to_shape), masks.dtype)
    gain, pad_w, pad_h = _letterbox_geom(from_shape, to_shape)
    sy = masks.shape[-2] / from_shape[0]
    sx = masks.shape[-1] / from_shape[1]
    y1, x1 = int(round(pad_h * sy)), int(round(pad_w * sx))
    y2 = masks.shape[-2] - y1
    x2 = masks.shape[-1] - x1
    crop = masks[:, y1:max(y2, y1 + 1), x1:max(x2, x1 + 1)]
    oh, ow = to_shape
    ys = (np.arange(oh) * crop.shape[-2] / oh).astype(int)
    xs = (np.arange(ow) * crop.shape[-1] / ow).astype(int)
    return crop[:, ys[:, None], xs[None, :]]


class Predictor:
    """NMS-free detection predictor."""

    def __init__(self, model, spec, variables, args, names=None, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis for
        data-parallel inference — variables are replicated once, each chunk's
        batch dim is sharded over the axis, and XLA partitions the jitted
        forward with no collectives (pure dp; batch must divide the axis
        size, otherwise the chunk silently runs unsharded)."""
        self.model = model
        self.spec = spec
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicated

            variables = jax.device_put(variables, replicated(mesh))
        self.variables = variables
        self.args = args
        self.names = names or {i: str(i) for i in range(spec.nc)}
        # head-module -> predict task (reference task_map ``predictor`` slot)
        self.task = {
            "v10Detect3d": "detect3d", "Segment": "segment", "Pose": "pose",
            "OBB": "obb", "Classify": "classify", "RTDETRDecoder": "rtdetr",
        }.get(spec.head_module, "detect")
        self.task3d = self.task == "detect3d"
        # v10 heads are NMS-free (dict output); Detect/WorldDetect need NMS
        self.nms_free = spec.head_module in ("v10Detect",)
        # serving twin: same spec + identical param tree, but skip the
        # train-only one2many branches at eval and (3D) run the o2o
        # regression branches on top-max_det patches only — the sparse
        # inference the reference uses at eval (head.py:694); detections
        # provably identical, measured +22-27% end-to-end at 384x1280
        # (tools/exp_sparse_infer3d.py: 956 -> 1167 img/s at B=64)
        from ..nn.build import YOLOModel
        from ..nn.heads3d import SPARSE_K

        # spd_serving: the preprocess stage emits the space-to-depth-packed
        # (B, H/2, W/2, 12) layout and the stem consumes it directly —
        # measured 1.084x on the model stage at 640^2 B=128 bf16 when the
        # input arrives packed (tools/exp_spd_serving.py). The repack is an
        # exact weight reshape; detections match the strided stem to f32
        # accumulation noise (tests/test_spd_stem.py asserts rtol 1e-5 /
        # atol 1e-4 — conv accumulation order differs). Default ON
        # (cfg default.yaml spd_serving: True); spd_serving=False keeps the
        # strided-stem layout.
        spd = (
            "packed"
            if (args is not None and args.get("spd_serving"))
            else model.spd_stem if isinstance(model, YOLOModel) else False
        )
        self._spd_packed = spd == "packed"
        if spec.head_module in ("v10Detect", "v10Detect3d") and isinstance(
            model, YOLOModel
        ):
            self.model = YOLOModel(
                spec=spec,
                fast_eval=True,
                # sparse is only exact while the decode top-k stays within the
                # head's per-scale candidate set (off-candidate regression=0)
                sparse_eval=spec.head_module == "v10Detect3d"
                and int(getattr(args, "max_det", 300) or 300) <= SPARSE_K,
                spd_stem=spd,
            )
        else:
            self._spd_packed = False

    @functools.lru_cache(maxsize=8)
    def _forward_fn(self, max_det: int):
        """Jitted forward+decode per task; every branch returns a tuple of
        fixed-shape arrays consumed by ``_process_chunk``."""
        spec = self.spec
        packed = getattr(self, "_spd_packed", False)

        def norm(x):
            x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
            if packed and x.shape[-1] == 3:
                # host-letterboxed (unpacked) inputs: pack in-graph — parity
                # with the packed stem, measured cost-neutral (fused-pack row
                # in tools/exp_spd_serving.py)
                from ..ops.spd_stem import space_to_depth

                x = space_to_depth(x)
            return x

        if self.task == "detect3d":
            from ..nn.heads3d import SPARSE_K

            model = self.model
            if getattr(model, "sparse_eval", False) and max_det > SPARSE_K:
                # per-call max_det override above the head's candidate set:
                # off-candidate sparse regression is zero, so fall back to
                # the dense fast_eval twin for this decode width
                from ..nn.build import YOLOModel

                model = YOLOModel(
                    spec=spec, fast_eval=True, spd_stem=model.spd_stem
                )

            @jax.jit
            def fwd(variables, x):
                feats = model.apply(variables, norm(x), train=False)["one2one"]
                nl = len(feats)
                preds = decode_detect3d(feats, spec.strides[:nl], spec.nc)
                reg, scores, labels = v10_3d_postprocess(preds, max_det, spec.nc)
                return reg, jax.nn.sigmoid(scores), labels
        elif self.task == "classify":
            @jax.jit
            def fwd(variables, x):
                logits = self.model.apply(variables, norm(x), train=False)
                return (jax.nn.softmax(logits, -1),)
        elif self.task == "rtdetr":
            # one decode implementation, shared with validation (the obb
            # branch does the same; duplicated decodes drift)
            from .validator_tasks import RTDETRValidator

            fwd = RTDETRValidator(self.model, spec)._forward_fn(max_det)
        elif self.task == "segment":
            from ..ops.boxes import xyxy2xywh
            from ..ops.nms import non_max_suppression
            from ..ops.postprocess import decode_detect, flatten_feats, process_masks

            @jax.jit
            def fwd(variables, x):
                xn = norm(x)
                out = self.model.apply(variables, xn, train=False)
                nl = len(out["det"])
                preds = decode_detect(out["det"], spec.strides[:nl], spec.nc)
                preds = jnp.concatenate([xyxy2xywh(preds[..., :4]), preds[..., 4:]], -1)
                mc, _ = flatten_feats(out["mask_coefs"])
                boxes, scores, labels, valid, coefs = non_max_suppression(
                    preds, conf_thres=0.001, max_det=max_det, extra=mc
                )
                masks = process_masks(out["protos"], coefs, boxes, (xn.shape[1], xn.shape[2]))
                return boxes, scores, labels, masks > 0.5
        elif self.task == "pose":
            from ..ops.boxes import xyxy2xywh
            from ..ops.nms import non_max_suppression
            from ..ops.postprocess import decode_detect, decode_kpts

            # kpt_shape lives in the Pose head's layer args (nc, ch,
            # kpt_shape) — nn/build.py:372; the 2-int list is unambiguous
            head_args = spec.layers[spec.head_index].args
            kpt_shape = next(
                (
                    tuple(a) for a in head_args
                    if isinstance(a, (list, tuple)) and len(a) == 2
                    and all(isinstance(v, int) for v in a)
                ),
                (17, 3),
            )
            nk, nd = kpt_shape

            @jax.jit
            def fwd(variables, x):
                out = self.model.apply(variables, norm(x), train=False)
                nl = len(out["det"])
                preds = decode_detect(out["det"], spec.strides[:nl], spec.nc)
                preds = jnp.concatenate([xyxy2xywh(preds[..., :4]), preds[..., 4:]], -1)
                kpts = decode_kpts(out["kpts"], spec.strides[:nl], (nk, nd))
                boxes, scores, labels, valid, kq = non_max_suppression(
                    preds, conf_thres=0.001, max_det=max_det, extra=kpts
                )
                return boxes, scores, labels, kq.reshape(*kq.shape[:2], nk, nd)
        elif self.task == "obb":
            from .validator_tasks import OBBValidator

            obb_fwd = OBBValidator(self.model, spec)._forward_fn(max_det, 0.001, 0.7)

            @jax.jit
            def fwd(variables, x):
                rbox, scores, labels, valid = obb_fwd(variables, x)
                return rbox, scores, labels
        elif not self.nms_free:  # v8-family Detect / WorldDetect: NMS path
            from ..ops.postprocess import v8_detections

            @jax.jit
            def fwd(variables, x):
                feats = self.model.apply(variables, norm(x), train=False)
                if isinstance(feats, dict):
                    feats = feats.get("one2one", feats)
                det = v8_detections(
                    feats, spec.strides, spec.nc, conf=0.001, max_det=max_det
                )
                return det["boxes"], det["scores"], det["labels"]
        else:
            @jax.jit
            def fwd(variables, x):
                feats = self.model.apply(variables, norm(x), train=False)["one2one"]
                det = v10_detections(feats, spec.strides, spec.nc, max_det=max_det)
                return det["boxes"], det["scores"], det["labels"]

        if self.args is not None and self.args.get("int8") and self.task == "detect3d":
            # int8 measured 17% SLOWER on the 3D sparse-eval serving path
            # (tools/exp_int8_scope3d.py: bf16 2130 img/s vs int8 1733/1762
            # at 384x1280 B=128) — the gathered top-k patch shapes the
            # sparse head runs its 16 regression branches on quantize badly
            # (quant/requant overhead on small irregular tiles). On-the-fly
            # TPU int8 saves no memory, so there is no reason to serve a
            # slower config: warn and keep bf16.
            from ..utils import LOGGER

            LOGGER.warning(
                "int8=True ignored for the 3D serving path: measured slower "
                "than bf16 on TPU (see tools/exp_int8_scope3d.py); serving bf16."
            )
        elif self.args is not None and self.args.get("int8"):
            # int8=True extends the reference's export-only PTQ knob
            # (exporter.py int8 arg) to live TPU serving: the trace-time
            # int8 switch quantizes the measured-winning convs (k>=3 dense
            # + deep-stage 1x1s) with int8 IO between them. Measured +8.1%
            # e2e over bf16 at 640^2 B=128 (tools/exp_int8_scope.py:
            # 3018 -> 3263 img/s). The switch is a trace-time global, so it
            # must be ON while jit traces — the wrapper toggles it around
            # every call; after the first (tracing) call the jit cache hits
            # and the toggle is a no-op nanoseconds guard, not a retrace.
            from ..nn.modules import set_int8_mode

            inner = fwd

            def fwd(variables, x, _inner=inner):
                set_int8_mode(True, scope="k3deep")
                try:
                    return _inner(variables, x)
                finally:
                    set_int8_mode(False)

        return fwd

    @functools.lru_cache(maxsize=8)
    def _device_preprocess_fn(self, out_hw: tuple):
        """uint8 H2D + fused device letterbox (+/255) — the BASELINE.json
        north-star serving path (ops/pallas_preprocess.serve_preprocess)."""
        from ..ops.pallas_preprocess import serve_preprocess

        packed = getattr(self, "_spd_packed", False)

        @jax.jit
        def prep(imgs_u8):
            x = serve_preprocess(imgs_u8, out_hw)
            if packed:
                # emit the packed layout here, where the output write exists
                # anyway — the forward stage then starts at the k2/s1 stem
                from ..ops.spd_stem import space_to_depth

                x = space_to_depth(x)
            return x

        return prep

    def _resolve(self, conf, max_det, imgsz):
        from ..utils.checks import check_imgsz

        conf = conf if conf is not None else (self.args.get("conf") or 0.25)
        max_det = max_det or self.args.get("max_det") or (50 if self.task3d else 300)
        imgsz = check_imgsz(
            imgsz or self.args.get("imgsz") or 640,
            stride=max(self.spec.strides) if self.spec.strides else 32,
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

        def h2d(arr):
            """Place the host batch; under a dp mesh, shard the batch dim so
            preprocessing AND the forward partition across devices."""
            if self.mesh is not None and arr.shape[0] % self.mesh.size == 0:
                from ..parallel.mesh import batch_sharding

                return jax.device_put(arr, batch_sharding(self.mesh))
            return jnp.asarray(arr)

        if self.task == "classify":
            # the reference predicts classify through classify_transforms
            # (shortest-edge resize + center crop), NOT letterbox — matching
            # the val pipeline keeps train/val/predict statistics identical
            from ..data.classify_aug import classify_val_transform

            size = int(imgsz if isinstance(imgsz, int) else max(imgsz))
            cf = (
                float(self.args.get("crop_fraction", 1.0) or 1.0)
                if self.args is not None else 1.0
            )
            batch = np.stack(
                [classify_val_transform(im, size, cf) for im in imgs]
            )
            x = h2d(batch)  # uint8; the jitted norm() scales /255
            model_hw = batch.shape[1:3]
        elif uniform:
            x = self._device_preprocess_fn(tuple(shape))(h2d(np.stack(imgs)))
            model_hw = tuple(shape)
        else:
            batch, _ = preprocess_batch(imgs, imgsz)
            x = h2d(batch)
            model_hw = batch.shape[1:3]
        t1 = time.perf_counter()
        out = fwd(self.variables, x)
        # ONE batched transfer: per-array np.asarray pays a tunnel round
        # trip each (~10-25 ms x n_outputs through axon; serving load test)
        out = tuple(jax.device_get(out))
        t2 = time.perf_counter()
        results = []
        for j, (path, img) in enumerate(chunk):
            if self.task == "classify":
                res = Results(img, path=path, names=self.names, probs=out[0][j])
                res.speed = {
                    "preprocess": (t1 - t0) / len(chunk) * 1e3,
                    "inference": (t2 - t1) / len(chunk) * 1e3,
                }
                results.append(res)
                continue
            boxes_or_reg, scores, labels = out[0], out[1], out[2]
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
            elif self.task == "obb":
                rbox = boxes_or_reg[j][keep].copy()  # (K, 5) xywhr model px
                gain, pad_w, pad_h = _letterbox_geom(model_hw, img.shape[:2])
                rbox[:, 0] = (rbox[:, 0] - pad_w) / gain
                rbox[:, 1] = (rbox[:, 1] - pad_h) / gain
                rbox[:, 2:4] = rbox[:, 2:4] / gain
                obb = np.concatenate(
                    [rbox, scores[j][keep, None], labels[j][keep, None]], -1
                )
                res = Results(img, path=path, names=self.names, obb=obb)
            elif self.task == "segment":
                b = _scale_boxes_np(boxes_or_reg[j][keep], model_hw, img.shape[:2])
                det = np.concatenate(
                    [b, scores[j][keep, None], labels[j][keep, None]], -1
                )
                masks = _scale_masks_np(out[3][j][keep], model_hw, img.shape[:2])
                res = Results(img, path=path, names=self.names, boxes=det, masks=masks)
            elif self.task == "pose":
                b = _scale_boxes_np(boxes_or_reg[j][keep], model_hw, img.shape[:2])
                det = np.concatenate(
                    [b, scores[j][keep, None], labels[j][keep, None]], -1
                )
                kpts = _scale_kpts_np(out[3][j][keep], model_hw, img.shape[:2])
                res = Results(img, path=path, names=self.names, boxes=det, keypoints=kpts)
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
        save: bool = False,
        save_txt: bool = False,
        save_crop: bool = False,
        save_dir: str = "runs/predict",
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
        if save or save_txt or save_crop:
            self._save_outputs(results, save, save_txt, save_crop, save_dir)
        return results

    @staticmethod
    def _save_outputs(results, save, save_txt, save_crop, save_dir):
        """Annotated images / YOLO txt / per-detection crops (reference
        predictor.py ``save_preds``/``write_results``)."""
        from pathlib import Path as _P

        out = _P(save_dir)
        out.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        used = set()
        for i, r in enumerate(results):
            stem = _P(str(r.path)).stem or f"image{i}"
            stem = stem.replace("#", "_")
            if stem in used or stem in ("array", "pil", "tensor"):
                stem = f"{stem}{i}"  # ndarray/PIL sources all share one path
            used.add(stem)
            if save:
                Image.fromarray(r.plot()).save(out / f"{stem}.jpg")
            if save_txt:
                (out / "labels").mkdir(exist_ok=True)
                r.save_txt(out / "labels" / f"{stem}.txt", save_conf=True)
            if save_crop and r.boxes is not None:
                crop_dir = out / "crops"
                for j in range(len(r.boxes)):
                    x1, y1, x2, y2 = (int(v) for v in r.boxes.xyxy[j])
                    c = int(r.boxes.cls[j])
                    d = crop_dir / str(r.names.get(c, c))
                    d.mkdir(parents=True, exist_ok=True)
                    crop = r.orig_img[max(y1, 0):max(y2, 1), max(x1, 0):max(x2, 1)]
                    if crop.size:
                        Image.fromarray(crop).save(d / f"{stem}_{j}.jpg")

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
