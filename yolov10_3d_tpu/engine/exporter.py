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

    def __call__(
        self,
        fmt: str = "stablehlo",
        imgsz: Union[int, Tuple[int, int]] = 640,
        batch: int = 1,
        max_det: Optional[int] = None,
        out: Optional[str] = None,
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
            blob = converter.convert()
            path = Path(out or "model.tflite")
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
