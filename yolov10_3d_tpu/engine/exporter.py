"""Model export (reference: engine/exporter.py ``Exporter``).

TPU-native primary format: StableHLO via jax.export (portable, ahead-of-time
compilable, consumable from C++ through PjRt — the equivalent of the
reference's ONNX/TensorRT path). Also: native .ckpt weights and a pure
flatbuffer-free "saved_model"-style directory with the MLIR + weights.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class Exporter:
    def __init__(self, model, spec, variables, args=None, meta=None):
        self.model = model
        self.spec = spec
        self.variables = variables
        self.args = args
        # model_yaml/names etc., embedded in ckpt exports so reloading
        # rebuilds the RIGHT architecture (review finding: the default meta
        # silently rebuilt yolov10n under any exported params)
        self.extra_meta = dict(meta or {})

    def _forward(self, max_det: int):
        spec = self.spec
        if spec.head_module == "v10Detect3d":
            from ..ops.postprocess import decode_detect3d, v10_3d_postprocess

            def fwd(variables, x):
                feats = self.model.apply(variables, x, train=False)["one2one"]
                nl = len(feats)
                preds = decode_detect3d(feats, spec.strides[:nl], spec.nc)
                reg, scores, labels = v10_3d_postprocess(preds, max_det, spec.nc)
                return reg, jax.nn.sigmoid(scores), labels
        elif spec.head_module == "Classify":
            def fwd(variables, x):
                return (jax.nn.softmax(self.model.apply(variables, x, train=False), -1),)
        else:
            from ..ops.postprocess import v8_detections, v10_detections

            def fwd(variables, x):
                out = self.model.apply(variables, x, train=False)
                # head dispatch (review finding: non-v10 heads crashed on
                # ["one2one"]): v10 dict -> NMS-free; Detect list ->
                # v8 NMS; Segment/Pose/OBB dicts export the det epilogue
                if isinstance(out, dict) and "one2one" in out:
                    det = v10_detections(
                        out["one2one"], spec.strides, spec.nc, max_det=max_det
                    )
                else:
                    feats = out["det"] if isinstance(out, dict) else out
                    det = v8_detections(
                        feats, spec.strides, spec.nc, conf=0.001, max_det=max_det
                    )
                return det["boxes"], det["scores"], det["labels"]

        return fwd

    def _representative_dataset(self, data, shape, n_samples: int = 32):
        """Calibration-image generator for int8 PTQ (reference
        exporter.py:442-459 builds one from the dataset yaml). ``data`` may
        be an (N, H, W, 3) float array, a dataset yaml/image-dir path (read
        through our aug-off loader), or None (uniform noise — calibrates
        ranges but not content statistics; a warning is logged)."""
        import numpy as np

        b, h, w, _ = shape
        if data is None:
            from ..utils import LOGGER

            LOGGER.warning(
                "int8 export without data=: calibrating on uniform noise. "
                "Pass data=<dataset.yaml or (N,H,W,3) array> for real ranges."
            )
            rng = np.random.default_rng(0)

            def gen():
                for _ in range(n_samples):
                    yield [rng.uniform(0, 1, shape).astype(np.float32)]

            return gen
        if isinstance(data, np.ndarray):
            arr = np.asarray(data, np.float32)
            if arr.max() > 2.0:
                arr = arr / 255.0

            def gen():
                for i in range(0, min(len(arr), n_samples * b), b):
                    chunk = arr[i : i + b]
                    if chunk.shape[0] == b:
                        yield [chunk]

            return gen
        # path: dataset yaml or image dir through the real loader
        from pathlib import Path

        import yaml

        from ..data.dataset import DataLoader, YOLODataset

        p = Path(str(data))
        if p.suffix in (".yaml", ".yml"):
            d = yaml.safe_load(p.read_text())
            root = Path(d.get("path", p.parent))
            img_path = root / d.get("val", d.get("train", "images"))
        else:
            img_path = p
        ds = YOLODataset(img_path, imgsz=(w, h) if h != w else h, augment=False)
        loader = DataLoader(ds, b, shuffle=False, drop_last=True)

        def gen():
            seen = 0
            while seen < n_samples:
                for bt in loader:
                    yield [np.asarray(bt["img"], np.float32) / 255.0]
                    seen += 1
                    if seen >= n_samples:
                        break

        return gen

    def __call__(
        self,
        fmt: str = "stablehlo",
        imgsz: Union[int, Tuple[int, int]] = 640,
        batch: int = 1,
        max_det: Optional[int] = None,
        out: Optional[str] = None,
        int8: bool = False,
        half: bool = False,
        data=None,
    ) -> str:
        hw = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
        max_det = max_det or (50 if self.spec.head_module == "v10Detect3d" else 300)
        fwd = self._forward(max_det)
        x = jnp.zeros((batch, hw[0], hw[1], 3), jnp.float32)

        if fmt in ("stablehlo", "saved_model"):
            from jax import export as jexport

            closed = jax.jit(lambda x: fwd(self.variables, x))
            exported = jexport.export(closed)(x)
            out_dir = Path(out or f"export_{fmt}")
            out_dir.mkdir(parents=True, exist_ok=True)
            (out_dir / "model.stablehlo.mlir").write_text(exported.mlir_module())
            (out_dir / "model.serialized").write_bytes(exported.serialize())
            meta = {
                "input_shape": list(x.shape),
                "outputs": ["boxes_or_reg", "scores", "labels"],
                "nc": self.spec.nc,
                "max_det": max_det,
                "strides": list(self.spec.strides),
            }
            (out_dir / "metadata.json").write_text(json.dumps(meta, indent=1))
            return str(out_dir)

        if fmt == "ckpt":
            from ..utils.checkpoint import save_checkpoint

            path = out or "model.ckpt"
            save_checkpoint(
                path,
                params=jax.device_get(self.variables["params"]),
                batch_stats=jax.device_get(self.variables.get("batch_stats", {})),
                meta={"nc": self.spec.nc, "strides": list(self.spec.strides),
                      **self.extra_meta},
            )
            return path

        if fmt in ("tf_saved_model", "tflite", "pb"):
            # reference exporter.py TF formats, via jax2tf native serialization
            try:
                import tensorflow as tf
                from jax.experimental import jax2tf
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(f"{fmt} export requires tensorflow: {e}")

            tf_fn = jax2tf.convert(
                lambda x: fwd(self.variables, x), native_serialization=True,
                # serialize for BOTH platforms: without this the artifact is
                # locked to the platform jax happens to be running on — a
                # .tflite/.pb exported from a TPU session would refuse to run
                # on the CPU devices those formats exist for (caught by the
                # /verify drive under JAX_PLATFORMS=axon)
                native_serialization_platforms=("cpu", "tpu"),
            )
            module = tf.Module()
            module.f = tf.function(
                tf_fn,
                autograph=False,
                input_signature=[tf.TensorSpec(list(x.shape), tf.float32)],
            )
            out_dir = Path(out or f"export_{fmt}")
            if fmt == "tf_saved_model":
                tf.saved_model.save(module, str(out_dir))
                return str(out_dir)
            if fmt == "pb":
                # frozen GraphDef (reference exporter.py export_pb: a
                # variable-free single-file graph for tf.import_graph_def
                # consumers); jax2tf graphs are already constant-folded, the
                # v2 freezer just inlines captures and serializes
                from tensorflow.python.framework.convert_to_constants import (
                    convert_variables_to_constants_v2,
                )

                frozen = convert_variables_to_constants_v2(
                    module.f.get_concrete_function()
                )
                gd = frozen.graph.as_graph_def()
                path = Path(out or "model.pb")
                path.parent.mkdir(parents=True, exist_ok=True)
                path.write_bytes(gd.SerializeToString())
                # sidecar with the tensor endpoint names (GraphDef itself has
                # no signature); AutoBackend reads it back
                meta = {
                    "inputs": [t.name for t in frozen.inputs],
                    "outputs": [t.name for t in frozen.outputs],
                    "input_shape": list(x.shape),
                }
                Path(str(path) + ".json").write_text(json.dumps(meta, indent=1))
                return str(path)
            converter = tf.lite.TFLiteConverter.from_concrete_functions(
                [module.f.get_concrete_function()], module
            )
            converter.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS,
                tf.lite.OpsSet.SELECT_TF_OPS,
            ]
            # quantized variants (reference exporter.py:296,442-459,616):
            #   int8 + representative dataset -> static-range PTQ (weights +
            #   activations int8 where supported, float fallback for the
            #   decode epilogue; measured 3.7x smaller than f32),
            #   half -> fp16 weights (2x smaller). I/O stays float32 — the
            #   AutoBackend forward() contract — where the reference flips
            #   edge-device artifacts to int8 I/O.
            if int8:
                converter.optimizations = [tf.lite.Optimize.DEFAULT]
                converter.representative_dataset = self._representative_dataset(
                    data, (batch, hw[0], hw[1], 3)
                )
            elif half:
                converter.optimizations = [tf.lite.Optimize.DEFAULT]
                converter.target_spec.supported_types = [tf.float16]
            blob = converter.convert()
            suffix = "_int8" if int8 else "_fp16" if half else ""
            path = Path(out or f"model{suffix}.tflite")
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_bytes(blob)
            return str(path)

        if fmt in ("torch", "pt"):
            # reference-compatible torch weights (utils/torch_export.py):
            # dotted state_dict + model_yaml; a reference user strict-loads it
            # into YOLO(<model_yaml>).model (tasks.py:811's state_dict dual)
            from ..utils.torch_export import export_torch_checkpoint

            path = out or "model.pt"
            return export_torch_checkpoint(
                path,
                jax.device_get(self.variables),
                model_yaml=self.extra_meta.get("model_yaml"),
                names=self.extra_meta.get("names"),
                train_args=self.extra_meta.get("train_args"),
            )

        if fmt == "onnx":
            # In-repo jaxpr->ONNX translator (nn/onnx_export.py) — no onnx
            # package needed. v10/v10-3D/classify heads export the full
            # NMS-free epilogue (TopK is an ONNX op); other detect heads
            # export dense decoded predictions (B, A, 4+nc), matching the
            # reference torch.onnx default of leaving NMS to the consumer
            # (reference exporter.py:353 export_onnx, end2end=False path).
            from ..nn.onnx_export import export_onnx

            spec = self.spec
            meta = {
                "nc": str(spec.nc),
                "strides": json.dumps(list(spec.strides)),
                "max_det": str(max_det),
                "task_head": spec.head_module,
                # the (B,H,W,3) image input is exposed NCHW (ONNX convention)
                "input_layout": "NCHW",
            }
            if spec.head_module == "v10Detect3d":
                fn = lambda x: fwd(self.variables, x)  # noqa: E731
                out_names = ["reg", "scores", "labels"]
            elif spec.head_module == "Classify":
                fn = lambda x: fwd(self.variables, x)  # noqa: E731
                out_names = ["probs"]
            elif spec.head_module == "v10Detect":
                fn = lambda x: fwd(self.variables, x)  # noqa: E731
                out_names = ["boxes", "scores", "labels"]
            else:
                from ..ops.postprocess import decode_detect

                def fn(x):
                    o = self.model.apply(self.variables, x, train=False)
                    feats = o["det"] if isinstance(o, dict) else o
                    return decode_detect(feats, spec.strides, spec.nc)

                out_names = ["predictions"]
                meta["nms"] = "consumer"  # raw preds; NMS left to the runtime

            blob = export_onnx(
                fn, [x], input_names=["images"], output_names=out_names,
                model_name=str(self.extra_meta.get("model_yaml", "yolo")),
                metadata=meta,
            )
            path = Path(out or "model.onnx")
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_bytes(blob)
            return str(path)

        raise ValueError(
            f"unknown export format {fmt!r} "
            "(stablehlo, saved_model, ckpt, tf_saved_model, tflite, pb, onnx, torch)"
        )


def load_exported(path: str):
    """Round-trip loader for the serialized StableHLO artifact."""
    from jax import export as jexport

    blob = (Path(path) / "model.serialized").read_bytes()
    exported = jexport.deserialize(blob)
    return exported.call
