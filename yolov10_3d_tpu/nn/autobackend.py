"""Unified inference backend dispatch (reference: nn/autobackend.py
``AutoBackend`` — suffix-keyed loading of 13 formats).

TPU-native formats: native .ckpt (flax weights, rebuilt model), reference .pt
(via the torch weight converter), a serialized StableHLO export directory
(AOT artifact, weights baked in), a TF SavedModel directory, a .tflite
flatbuffer, a frozen .pb graph, an in-repo-runtime .onnx, and a reference-
exported .torchscript (torch-CPU) — i.e. every format the Exporter can emit
round-trips back through AutoBackend, plus the reference's own TorchScript
artifacts. All expose ``forward(imgs NHWC fp32) ->
(boxes_or_reg, scores, labels)`` with fixed shapes + ``warmup()``; a
TorchScript artifact that is NOT an end-to-end (B, max_det, 6) export
returns the module's raw outputs unchanged (documented in docs/export.md).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AutoBackend:
    def __init__(self, weights: str, max_det: Optional[int] = None):
        self.path = str(weights)
        p = Path(self.path)
        if p.is_dir() and (p / "model.serialized").exists():
            self.kind = "stablehlo"
        elif p.is_dir() and (p / "saved_model.pb").exists():
            self.kind = "tf_saved_model"
        else:
            self.kind = p.suffix.lstrip(".")
        if self.kind == "stablehlo":
            import json

            from ..engine.exporter import load_exported

            self._call = load_exported(self.path)
            meta = json.loads((p / "metadata.json").read_text())
            self.nc = meta["nc"]
            self.max_det = meta["max_det"]
            self.input_shape = tuple(meta["input_shape"])
            self.names = {i: str(i) for i in range(self.nc)}
        elif self.kind in ("ckpt", "pt"):
            from ..engine.model import Model

            facade = Model(self.path)
            self.facade = facade
            self.nc = facade.spec.nc
            self.names = facade.names
            self.max_det = max_det or (
                50 if facade.spec.head_module == "v10Detect3d" else 300
            )
            spec = facade.spec
            task3d = spec.head_module == "v10Detect3d"
            md = self.max_det

            if task3d:
                from ..ops.postprocess import decode_detect3d, v10_3d_postprocess

                @jax.jit
                def call(x):
                    feats = facade.model.apply(facade.variables, x, train=False)["one2one"]
                    preds = decode_detect3d(feats, spec.strides[: len(feats)], spec.nc)
                    return v10_3d_postprocess(preds, md, spec.nc)
            else:
                from ..ops.postprocess import v10_detections

                @jax.jit
                def call(x):
                    feats = facade.model.apply(facade.variables, x, train=False)["one2one"]
                    det = v10_detections(feats, spec.strides, spec.nc, max_det=md)
                    return det["boxes"], det["scores"], det["labels"]

            self._call = call
            self.input_shape = None
        elif self.kind == "tf_saved_model":
            import tensorflow as tf  # jax2tf export round-trip

            loaded = tf.saved_model.load(self.path)
            if hasattr(loaded, "f"):  # our Exporter writes a tf.Module with .f
                fn = loaded.f

                def call(x):
                    out = fn(tf.constant(np.asarray(x, np.float32)))
                    return tuple(o.numpy() for o in out)

                sig = fn.input_signature[0]
            else:  # generic serving_default signature
                fn = loaded.signatures["serving_default"]
                names = sorted(fn.structured_outputs)

                def call(x):
                    out = fn(tf.constant(np.asarray(x, np.float32)))
                    return tuple(out[k].numpy() for k in names)

                spec_in = fn.structured_input_signature[1]
                sig = (
                    next(iter(spec_in.values()))
                    if isinstance(spec_in, dict) else spec_in[0]
                )

            self._tf = loaded  # keep alive
            self._call = call
            self.nc = None
            self.names = {}
            self.max_det = max_det
            self.input_shape = tuple(
                d if d is not None else 1 for d in sig.shape.as_list()
            )
        elif self.kind == "tflite":
            import tensorflow as tf

            interp = tf.lite.Interpreter(model_path=self.path)
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]
            outs = interp.get_output_details()

            def call(x):
                interp.set_tensor(inp["index"], np.asarray(x, inp["dtype"]))
                interp.invoke()
                return tuple(interp.get_tensor(o["index"]) for o in outs)

            self._call = call
            self.nc = None
            self.names = {}
            self.max_det = max_det
            self.input_shape = tuple(int(d) for d in inp["shape"])
        elif self.kind == "pb":
            # frozen GraphDef (reference autobackend.py pb branch loads via
            # tf.import_graph_def + wrap_function; endpoint names come from
            # the Exporter's .pb.json sidecar)
            import json

            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(self.path).read_bytes())
            meta = json.loads(Path(self.path + ".json").read_text())

            def _import():
                tf.compat.v1.import_graph_def(gd, name="")

            wrapped = tf.compat.v1.wrap_function(_import, [])
            fn = wrapped.prune(
                feeds=[wrapped.graph.get_tensor_by_name(n) for n in meta["inputs"]],
                fetches=[wrapped.graph.get_tensor_by_name(n) for n in meta["outputs"]],
            )

            def call(x):
                out = fn(tf.constant(np.asarray(x, np.float32)))
                return tuple(o.numpy() for o in out)

            self._tf = wrapped  # keep alive
            self._call = call
            self.nc = None
            self.names = {}
            self.max_det = max_det
            self.input_shape = tuple(int(d) for d in meta["input_shape"])
        elif self.kind == "torchscript":
            # reference-exported TorchScript artifact (autobackend.py:169-173
            # loads with an embedded ``config.txt`` metadata extra-file); runs
            # on torch-CPU here — the migration path for users holding the
            # reference's first-listed export format. Inputs bridge NHWC
            # (our forward() contract) -> NCHW (torch image layout).
            import json

            import torch

            extra = {"config.txt": ""}
            mod = torch.jit.load(self.path, _extra_files=extra, map_location="cpu")
            mod.eval()
            # pin to fp32: GPU-targeted reference exports are often half()
            # (reference autobackend.py model.half()/model.float()), and our
            # forward() contract feeds fp32 NHWC
            mod.float()
            meta = {}
            if extra["config.txt"]:
                try:
                    meta = json.loads(extra["config.txt"])
                except (ValueError, TypeError):
                    meta = {}
            names = meta.get("names") or {}
            # older reference exports serialize names as a plain list
            names = dict(enumerate(names)) if isinstance(names, list) else dict(names)
            self.names = {int(k): str(v) for k, v in names.items()}
            self.nc = len(self.names) or None
            self.max_det = max_det
            shp = meta.get("imgsz")
            self.input_shape = (
                (int(meta.get("batch", 1)), int(shp[0]), int(shp[1]), 3)
                if shp else None
            )

            def call(x):
                # np.array(copy=True): device arrays surface as read-only
                # buffers, and torch.from_numpy refuses non-writable views
                xin = torch.from_numpy(
                    np.array(
                        np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2)),
                        dtype=np.float32,
                    )
                )
                with torch.no_grad():
                    out = mod(xin)
                if isinstance(out, (list, tuple)):
                    out = tuple(
                        o.numpy() for o in out if isinstance(o, torch.Tensor)
                    )
                else:
                    out = (out.numpy(),)
                # reference end-to-end exports return one (B, max_det, 6)
                # tensor [x1,y1,x2,y2,conf,cls] (v10Detect/v10postprocess);
                # split it into the unified (boxes, scores, labels) contract
                if (
                    len(out) == 1
                    and out[0].ndim == 3
                    and out[0].shape[-1] == 6
                ):
                    det = out[0]
                    return (
                        det[..., :4],
                        det[..., 4],
                        det[..., 5].astype(np.int32),
                    )
                # anything else (raw multi-scale head output) is returned
                # as-is — callers needing decoded boxes should export
                # end-to-end or load the .pt via the weight converter
                return out

            self._torch = mod  # keep alive
            self._call = call
        elif self.kind == "onnx":
            # in-repo numpy ONNX runtime (nn/onnx_runtime.py) — loads the
            # Exporter's .onnx artifact without onnxruntime (reference
            # autobackend.py loads .onnx via onnxruntime sessions)
            from .onnx_runtime import OnnxRuntime

            rt = OnnxRuntime(Path(self.path).read_bytes())
            meta = rt.model.metadata
            self.nc = int(meta["nc"]) if "nc" in meta else None
            self.max_det = max_det or (
                int(meta["max_det"]) if "max_det" in meta else None
            )
            self.names = (
                {i: str(i) for i in range(self.nc)} if self.nc else {}
            )
            in_info = rt.input_info[rt.input_names[0]]
            dims = tuple(int(d) if not isinstance(d, str) else 1
                         for d in in_info.shape)
            # the exporter records the graph input layout; only NCHW image
            # graphs get the NHWC->NCHW bridge (non-4D / non-RGB inputs are
            # exported in their native layout)
            nchw = meta.get("input_layout", "NCHW" if len(dims) == 4 else "") == "NCHW"
            if nchw:
                n, c, h, w = dims
                self.input_shape = (n, h, w, c)  # forward() takes NHWC

                def call(x):
                    xin = np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2))
                    return rt(xin)
            else:
                self.input_shape = dims

                def call(x):
                    return rt(np.asarray(x, np.float32))

            self._rt = rt
            self._call = call
        else:
            raise ValueError(
                f"unsupported weights format {self.kind!r} (supported: .ckpt, "
                ".pt, stablehlo export dir, TF SavedModel dir, .tflite, .pb, "
                ".onnx, .torchscript)"
            )

    def forward(self, imgs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        out = self._call(jnp.asarray(imgs))
        return tuple(np.asarray(o) for o in out)

    __call__ = forward

    def warmup(self, imgsz: Tuple[int, int, int, int] = (1, 640, 640, 3)):
        shape = self.input_shape or imgsz
        self.forward(np.zeros(shape, np.float32))
        return self
