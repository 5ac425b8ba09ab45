"""Latency/throughput benchmarking (reference: utils/benchmarks.py:44).

Measures the jitted forward+decode at several batch sizes with per-call host
readback and reports the fixed-overhead-cancelling marginal throughput (see
bench.py for why plain block_until_ready timing is unreliable on tunneled
devices)."""

from __future__ import annotations

import time
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np


def benchmark(
    model_or_facade,
    imgsz: Union[int, tuple] = 640,
    batches=(1, 16, 64),
    iters: int = 10,
    dtype=jnp.bfloat16,
    **_,
) -> Dict[str, float]:
    from ..ops.postprocess import v10_detections

    facade = model_or_facade
    model, spec, variables = facade.model, facade.spec, facade.variables
    hw = (imgsz, imgsz) if isinstance(imgsz, int) else (imgsz[1], imgsz[0])
    variables = jax.tree.map(
        lambda v: v.astype(dtype) if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
        variables,
    )

    @jax.jit
    def fwd(variables, x):
        feats = model.apply(variables, x, train=False)["one2one"]
        det = v10_detections(feats, spec.strides, spec.nc, max_det=300)
        return det["scores"].sum()

    rng = np.random.default_rng(0)
    out = {}
    times = {}
    for b in batches:
        x = jnp.asarray(
            rng.uniform(0, 1, (b, hw[0], hw[1], 3)).astype(np.float32)
        ).astype(dtype)
        float(fwd(variables, x))  # compile+warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fwd(variables, x))
            ts.append(time.perf_counter() - t0)
        times[b] = float(np.median(ts))
        out[f"latency_ms_b{b}"] = times[b] * 1e3
        out[f"imgs_per_sec_b{b}"] = b / times[b]
    bs = sorted(times)
    if len(bs) >= 2:
        b1, b2 = bs[0], bs[-1]
        out["marginal_imgs_per_sec"] = (b2 - b1) / max(times[b2] - times[b1], 1e-9)
    return out


def _dir_size_mb(path) -> float:
    from pathlib import Path

    p = Path(path)
    if p.is_file():
        return p.stat().st_size / 1e6
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) / 1e6


def benchmark_formats(
    facade,
    imgsz: int = 64,
    formats=("ckpt", "stablehlo", "tf_saved_model", "tflite", "tflite-fp16",
             "tflite-int8", "pb", "onnx"),
    out_dir: str = "runs/benchmark",
    iters: int = 5,
):
    """Export-format benchmark table (reference benchmarks.py:44
    ``benchmark`` — exports each format, re-loads it through AutoBackend,
    times inference and verifies outputs against the native forward).
    Returns a list of row dicts: format, status, size_mb, latency_ms, match.
    """
    from pathlib import Path

    from ..engine.exporter import Exporter
    from ..nn.autobackend import AutoBackend
    from ..ops.postprocess import v10_detections

    model, spec, variables = facade.model, facade.spec, facade.variables
    x = np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32)
    ref_det = v10_detections(
        model.apply(variables, jnp.asarray(x), train=False)["one2one"],
        spec.strides, spec.nc, max_det=10,
    )
    ref_boxes = np.asarray(ref_det["boxes"])
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    ex = Exporter(model, spec, variables)
    for fmt in formats:
        row = {"format": fmt, "status": "❌", "size_mb": None, "latency_ms": None, "match": False}
        try:
            # suffix-bearing formats must keep their extension: AutoBackend
            # dispatches on it
            base_fmt, _, variant = fmt.partition("-")
            dest = out / (
                f"model_{variant or 'f32'}.{base_fmt}"
                if base_fmt in ("tflite", "pb", "onnx") else f"model_{fmt}"
            )
            if fmt == "ckpt":
                from .checkpoint import save_checkpoint

                dest = out / "model.ckpt"
                path = save_checkpoint(
                    str(dest),
                    params=variables["params"],
                    batch_stats=variables.get("batch_stats"),
                    meta={
                        "model_yaml": str(getattr(facade, "model_cfg", "yolov10n.yaml")),
                        "nc": spec.nc,
                    },
                )
            else:
                path = ex(
                    fmt=base_fmt, imgsz=imgsz, max_det=10, out=str(dest),
                    half=variant == "fp16", int8=variant == "int8",
                    data=(x if variant == "int8" else None),
                )
            backend = AutoBackend(path, max_det=10)
            outs = backend.forward(x)
            boxes = next(
                (np.asarray(o) for o in outs if getattr(o, "ndim", 0) == 3 and o.shape[-1] == 4),
                None,
            )
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                backend.forward(x)
                ts.append(time.perf_counter() - t0)
            row.update(
                status="✅",
                size_mb=round(_dir_size_mb(path), 2),
                latency_ms=round(float(np.median(ts)) * 1e3, 2),
                match=bool(
                    boxes is not None
                    and np.allclose(boxes, ref_boxes, rtol=1e-2, atol=1e-2)
                ),
            )
        except Exception as e:  # a failing format must not kill the table
            row["error"] = str(e)[:120]
        rows.append(row)
    print_table(rows)
    return rows


def iterative_sigma_clipping(data, sigma: float = 2.0, max_iters: int = 3):
    """Latency outlier rejection (reference benchmarks.py:271)."""
    data = np.asarray(data, np.float64)
    for _ in range(max_iters):
        mean, std = data.mean(), data.std()
        clipped = data[(data > mean - sigma * std) & (data < mean + sigma * std)]
        if len(clipped) == len(data) or len(clipped) == 0:
            break
        data = clipped
    return data


class ProfileModels:
    """Speed/params/FLOPs table over model YAMLs (reference
    benchmarks.py:154 ``ProfileModels`` — ours profiles the jitted TPU
    forward instead of ONNX/TensorRT engines)."""

    def __init__(self, paths, imgsz: int = 640, batch: int = 1, iters: int = 10):
        self.paths = [paths] if isinstance(paths, str) else list(paths)
        self.imgsz = imgsz
        self.batch = batch
        self.iters = iters

    def profile(self):
        from ..nn.build import build_model
        from .profiling import flops

        rows = []
        for path in self.paths:
            model, spec = build_model(path)
            x = jnp.zeros((self.batch, self.imgsz, self.imgsz, 3), jnp.float32)
            variables = jax.jit(model.init, static_argnames="train")(
                jax.random.PRNGKey(0), x, train=False
            )
            n_params = sum(int(v.size) for v in jax.tree.leaves(variables["params"]))
            fwd = jax.jit(
                lambda v, x: model.apply(v, x, train=False)["one2one"][0].sum()
            )
            fl = flops(lambda v, x: model.apply(v, x, train=False)["one2one"], variables, x)
            float(fwd(variables, x))
            ts = []
            for _ in range(self.iters):
                t0 = time.perf_counter()
                float(fwd(variables, x))
                ts.append(time.perf_counter() - t0)
            ts = iterative_sigma_clipping(ts)
            rows.append({
                "model": str(path),
                "params_M": round(n_params / 1e6, 2),
                "GFLOPs": round(fl / 1e9, 1) if fl else None,
                "latency_ms": round(float(np.mean(ts)) * 1e3, 2),
            })
        print_table(rows)
        return rows


def print_table(rows):
    """Aligned markdown-ish table (reference benchmarks.py:387)."""
    if not rows:
        return
    keys = list(rows[0])
    widths = {k: max(len(str(k)), *(len(str(r.get(k, ""))) for r in rows)) for k in keys}
    header = " | ".join(str(k).ljust(widths[k]) for k in keys)
    print(header)
    print("-|-".join("-" * widths[k] for k in keys))
    for r in rows:
        print(" | ".join(str(r.get(k, "")).ljust(widths[k]) for k in keys))
