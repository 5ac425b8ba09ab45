"""Pure-numpy ONNX graph evaluator for the op subset ``onnx_export`` emits.

onnxruntime is unavailable offline; this interpreter closes the loop: the
round-trip tests run the exported .onnx file against the jitted JAX forward,
and ``AutoBackend`` uses it so a ``.onnx`` artifact is a loadable inference
format on this box (reference: ultralytics/nn/autobackend.py:145 loads .onnx
via onnxruntime). Conv/MaxPool are implemented as kernel-tap accumulation
(k*k small matmuls) — fast enough for validation and CPU-bound serving, not
a TPU path (that's StableHLO/PjRt).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from . import onnx_wire as W


def _conv(x, w, b, pads, strides, dilations, group):
    """x (N,C,H,W), w (O, C/g, kh, kw) -> (N,O,oh,ow)."""
    n, c, h, wdt = x.shape
    o, cg, kh, kw = w.shape
    ph0, pw0, ph1, pw1 = pads
    sh, sw = strides
    dh, dw = dilations
    xp = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
    oh = (h + ph0 + ph1 - (kh - 1) * dh - 1) // sh + 1
    ow = (wdt + pw0 + pw1 - (kw - 1) * dw - 1) // sw + 1
    og = o // group
    out = np.zeros((n, o, oh, ow), np.result_type(x.dtype, w.dtype))
    for g in range(group):
        xg = xp[:, g * cg:(g + 1) * cg]
        wg = w[g * og:(g + 1) * og]
        acc = np.zeros((n, og, oh, ow), out.dtype)
        for i in range(kh):
            for j in range(kw):
                xs = xg[:, :, i * dh:i * dh + (oh - 1) * sh + 1:sh,
                        j * dw:j * dw + (ow - 1) * sw + 1:sw]
                # (N,cg,oh,ow) x (og,cg) -> (N,og,oh,ow)
                acc += np.einsum("nchw,oc->nohw", xs, wg[:, :, i, j],
                                 optimize=True)
        out[:, g * og:(g + 1) * og] = acc
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out


def _maxpool(x, kernel, strides, pads):
    n, c, h, w = x.shape
    kh, kw = kernel
    sh, sw = strides
    ph0, pw0, ph1, pw1 = pads
    neg = np.finfo(x.dtype).min if np.issubdtype(x.dtype, np.floating) else np.iinfo(x.dtype).min
    xp = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)),
                constant_values=neg)
    oh = (h + ph0 + ph1 - kh) // sh + 1
    ow = (w + pw0 + pw1 - kw) // sw + 1
    out = np.full((n, c, oh, ow), neg, x.dtype)
    for i in range(kh):
        for j in range(kw):
            np.maximum(
                out,
                xp[:, :, i:i + (oh - 1) * sh + 1:sh, j:j + (ow - 1) * sw + 1:sw],
                out=out,
            )
    return out


def _slice(x, starts, ends, axes=None, steps=None):
    rank = x.ndim
    axes = list(range(len(starts))) if axes is None else [int(a) % rank for a in axes]
    steps = [1] * len(starts) if steps is None else [int(s) for s in steps]
    sl = [slice(None)] * rank
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        st, en = int(st), int(en)
        lim = x.shape[ax]
        # ONNX clamps out-of-range starts/ends (INT64_MAX conventions)
        if sp > 0:
            st = min(max(st + lim if st < 0 else st, 0), lim)
            en = min(max(en + lim if en < 0 else en, 0), lim)
            sl[ax] = slice(st, en, sp)
        else:
            # ONNX semantics: INT64_MIN / any end <= -(lim+1) means
            # "include element 0"; check the sentinel BEFORE shifting
            open_end = en <= -(lim + 1)
            st = min(max(st + lim if st < 0 else st, -1), lim - 1)
            if not open_end:
                en = max(min(en + lim if en < -1 else en, lim), -lim - 1)
            sl[ax] = slice(st, None if open_end else en, sp)
    return x[tuple(sl)]


def _topk(x, k, axis, largest, sorted_):
    k = int(k)
    if not largest:
        x = -x
    idx = np.argsort(-x, axis=axis, kind="stable")
    idx = np.take(idx, np.arange(k), axis=axis)
    vals = np.take_along_axis(x, idx, axis=axis)
    if not largest:
        vals = -vals
    return vals, idx.astype(np.int64)


class OnnxRuntime:
    """Topological evaluator over a decoded ModelProto (our emitted subset)."""

    def __init__(self, model_bytes: bytes):
        self.model = W.decode_model(model_bytes)
        g = self.model.graph
        self.weights: Dict[str, np.ndarray] = {
            t.name: t.array for t in g.initializers
        }
        init_names = set(self.weights)
        self.input_names: List[str] = [
            v.name for v in g.inputs if v.name not in init_names
        ]
        self.output_names: List[str] = [v.name for v in g.outputs]
        self.input_info = {v.name: v for v in g.inputs}

    def __call__(self, *args: np.ndarray, **kwargs: np.ndarray):
        env: Dict[str, np.ndarray] = dict(self.weights)
        env[""] = None  # optional (empty) inputs
        for name, val in zip(self.input_names, args):
            env[name] = np.asarray(val)
        for name, val in kwargs.items():
            env[name] = np.asarray(val)
        for node in self.model.graph.nodes:
            outs = self._run_node(node, [env[i] for i in node.inputs])
            for name, val in zip(node.outputs, outs):
                env[name] = val
        return tuple(env[n] for n in self.output_names)

    # -- op dispatch --------------------------------------------------------

    def _run_node(self, node: W.Node, ins: List[np.ndarray]):
        op = node.op_type
        a = node.attributes
        if op == "Conv":
            bias = ins[2] if len(ins) > 2 else None
            return [_conv(ins[0], ins[1], bias,
                          a.get("pads", [0, 0, 0, 0]), a.get("strides", [1, 1]),
                          a.get("dilations", [1, 1]), a.get("group", 1))]
        if op == "MaxPool":
            return [_maxpool(ins[0], a["kernel_shape"],
                             a.get("strides", [1, 1]),
                             a.get("pads", [0, 0, 0, 0]))]
        if op == "Transpose":
            return [np.transpose(ins[0], a["perm"])]
        if op == "Reshape":
            shape = [int(s) for s in ins[1]]
            return [ins[0].reshape(shape)]
        if op == "Expand":
            # ONNX Expand = multidirectional broadcast to max(shape, input)
            target = [int(s) for s in ins[1]]
            return [np.broadcast_to(ins[0], np.broadcast_shapes(ins[0].shape, tuple(target)))]
        if op == "Concat":
            return [np.concatenate(ins, axis=a["axis"])]
        if op == "Split":
            sizes = [int(s) for s in ins[1]] if len(ins) > 1 else a["split"]
            idx = np.cumsum(sizes)[:-1]
            return list(np.split(ins[0], idx, axis=a.get("axis", 0)))
        if op == "Slice":
            return [_slice(ins[0], ins[1], ins[2],
                           ins[3] if len(ins) > 3 else None,
                           ins[4] if len(ins) > 4 else None)]
        if op == "Cast":
            return [ins[0].astype(W.onnx_to_np_dtype(a["to"]))]
        if op == "Identity":
            return [ins[0]]
        if op == "Sigmoid":
            x = ins[0]
            return [np.where(x >= 0, 1.0 / (1.0 + np.exp(-np.clip(x, -88, 88))),
                             np.exp(np.clip(x, -88, 88))
                             / (1.0 + np.exp(np.clip(x, -88, 88)))).astype(x.dtype)]
        if op == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(ins[0] - ins[0].max(axis=ax, keepdims=True))
            return [(e / e.sum(axis=ax, keepdims=True)).astype(ins[0].dtype)]
        _UNARY = {
            "Exp": np.exp, "Log": np.log, "Sqrt": np.sqrt, "Tanh": np.tanh,
            "Neg": np.negative, "Abs": np.abs, "Sign": np.sign,
            "Floor": np.floor, "Ceil": np.ceil, "Round": lambda x: np.round(x),
            "Sin": np.sin, "Cos": np.cos, "Not": np.logical_not,
            "Reciprocal": lambda x: (1.0 / x).astype(x.dtype),
            "IsNaN": np.isnan, "IsInf": np.isinf,
        }
        if op in _UNARY:
            out = _UNARY[op](ins[0])
            if op not in ("Not", "IsNaN", "IsInf"):
                out = np.asarray(out, ins[0].dtype)
            return [out]
        if op == "Erf":
            from math import erf
            return [np.vectorize(erf)(ins[0]).astype(ins[0].dtype)]
        _BINARY = {
            "Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
            "Max": np.maximum, "Min": np.minimum, "Pow": np.power,
            "And": np.logical_and, "Or": np.logical_or, "Xor": np.logical_xor,
            "Equal": np.equal, "Greater": np.greater, "Less": np.less,
            "GreaterOrEqual": np.greater_equal, "LessOrEqual": np.less_equal,
        }
        if op in _BINARY:
            out = _BINARY[op](ins[0], ins[1])
            if op in ("Add", "Sub", "Mul", "Max", "Min", "Pow"):
                out = np.asarray(out, np.result_type(ins[0].dtype, ins[1].dtype))
            return [out]
        if op == "Div":
            x, y = ins
            if np.issubdtype(x.dtype, np.integer):
                # ONNX Div on ints truncates toward zero (C semantics)
                return [(np.sign(x) * np.sign(y)
                         * (np.abs(x) // np.abs(y))).astype(x.dtype)]
            return [np.asarray(x / y, np.result_type(x.dtype, y.dtype))]
        if op == "Mod":
            x, y = ins
            if a.get("fmod", 0):
                return [np.asarray(np.fmod(x, y), x.dtype)]
            return [np.asarray(np.mod(x, y), x.dtype)]
        if op == "Where":
            return [np.where(ins[0], ins[1], ins[2])]
        if op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
            return [np.clip(ins[0], lo, hi).astype(ins[0].dtype)]
        if op == "ReduceSum":
            axes = tuple(int(x) for x in ins[1]) if len(ins) > 1 else None
            return [np.asarray(ins[0].sum(axis=axes,
                                          keepdims=bool(a.get("keepdims", 1))),
                               ins[0].dtype)]
        _RED = {"ReduceMax": np.max, "ReduceMin": np.min, "ReduceProd": np.prod,
                "ReduceMean": np.mean}
        if op in _RED:
            axes = tuple(a["axes"]) if "axes" in a else None
            return [np.asarray(_RED[op](ins[0], axis=axes,
                                        keepdims=bool(a.get("keepdims", 1))),
                               ins[0].dtype)]
        if op in ("ArgMax", "ArgMin"):
            f = np.argmax if op == "ArgMax" else np.argmin
            out = f(ins[0], axis=a.get("axis", 0))
            if a.get("keepdims", 1):
                out = np.expand_dims(out, a.get("axis", 0))
            return [out.astype(np.int64)]
        if op == "TopK":
            return list(_topk(ins[0], int(np.asarray(ins[1]).reshape(-1)[0]),
                              a.get("axis", -1), a.get("largest", 1),
                              a.get("sorted", 1)))
        if op == "Gather":
            return [np.take(ins[0], ins[1].astype(np.int64),
                            axis=a.get("axis", 0))]
        if op == "GatherElements":
            return [np.take_along_axis(ins[0], ins[1].astype(np.int64),
                                       axis=a.get("axis", 0))]
        if op == "GatherND":
            idx = ins[1].astype(np.int64)
            return [ins[0][tuple(np.moveaxis(idx, -1, 0))]]
        if op == "Einsum":
            return [np.einsum(a["equation"], *ins, optimize=True)]
        if op == "MatMul":
            return [np.matmul(ins[0], ins[1])]
        if op == "Pad":
            pads = [int(p) for p in ins[1]]
            rank = ins[0].ndim
            cval = ins[2] if len(ins) > 2 and ins[2] is not None else 0
            width = [(pads[i], pads[i + rank]) for i in range(rank)]
            return [np.pad(ins[0], width, constant_values=cval)]
        if op == "CumSum":
            axis = int(np.asarray(ins[1]).reshape(-1)[0])
            if a.get("reverse"):
                out = np.flip(np.cumsum(np.flip(ins[0], axis), axis=axis), axis)
            else:
                out = np.cumsum(ins[0], axis=axis)
            return [np.asarray(out, ins[0].dtype)]
        raise NotImplementedError(f"ONNX op {op!r} not implemented in numpy runtime")
