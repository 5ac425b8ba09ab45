"""jaxpr -> ONNX graph translator.

The reference exports ONNX by tracing torch modules through
``torch.onnx.export`` (reference: ultralytics/engine/exporter.py:353). The
TPU-native equivalent traces the *jitted inference function* to a jaxpr and
translates each primitive to ONNX ops — one translator covers every model
family (all YAML-built models, the NMS-free v10/v10-3D decode epilogues with
``TopK``, classification softmax) with no per-module export code.

Design notes:
- Weights enter as jaxpr constants and become ONNX initializers; any
  equation whose inputs are all constants is folded at export time with the
  primitive's own ``bind`` (so anchor grids, stride tables, iotas etc. ship
  as precomputed initializers instead of op chains).
- JAX convs here are NHWC/HWIO; ONNX Conv is NCHW/OIHW. Each conv/pool is
  wrapped in Transpose pairs (weights are pre-transposed at export) and the
  graph input is NCHW ``images`` for ONNX-ecosystem parity — consumers'
  graph optimizers fuse the transpose chains.
- Targets opset 13 (Split/ReduceSum axes-as-input; Einsum/GreaterOrEqual
  available).

``nn/onnx_runtime.py`` evaluates the emitted op subset in numpy, giving an
offline round-trip test and an ``AutoBackend`` .onnx path without
onnxruntime.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import onnx_wire as W

# Fold threshold: constants above this (bytes) are still folded when they
# must exist as data anyway, but broadcast-like expansions above it emit
# Expand ops instead of materializing the broadcast result.
_EXPAND_FOLD_LIMIT = 1 << 16


class GraphBuilder:
    def __init__(self):
        self.nodes: List[W.Node] = []
        self.initializers: List[W.Tensor] = []
        self._init_cache: Dict[object, str] = {}
        self._fetch_cache: Dict[int, np.ndarray] = {}
        self._n = 0

    def fresh(self, hint: str = "v") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def fetch(self, cval) -> np.ndarray:
        """device_get a jaxpr const once (weights recur in every sub-jaxpr)."""
        key = id(cval)
        if key not in self._fetch_cache:
            self._fetch_cache[key] = np.asarray(jax.device_get(cval))
        return self._fetch_cache[key]

    def const(self, arr: np.ndarray, hint: str = "c") -> str:
        arr = np.asarray(arr)
        # identity cache for big arrays; content cache for small ones (shape
        # tensors, axes, scalars recur hundreds of times)
        key = (arr.dtype.str, arr.shape, arr.tobytes()) if arr.nbytes <= 1024 else id(arr)
        if key in self._init_cache:
            return self._init_cache[key]
        name = self.fresh(hint)
        self.initializers.append(W.Tensor(name, arr))
        self._init_cache[key] = name
        return name

    def node(self, op: str, inputs: Sequence[str], n_out: int = 1,
             out_names: Optional[Sequence[str]] = None, **attrs) -> Any:
        outs = list(out_names) if out_names else [self.fresh(op.lower())
                                                  for _ in range(n_out)]
        self.nodes.append(
            W.Node(op_type=op, inputs=list(inputs), outputs=outs,
                   name=self.fresh(f"n_{op}"), attributes=attrs)
        )
        return outs[0] if len(outs) == 1 else tuple(outs)

    def i64(self, values) -> str:
        return self.const(np.asarray(values, np.int64), "i")


class _Ctx:
    """Translation environment: jaxpr var -> concrete np value or graph sym."""

    def __init__(self, builder: GraphBuilder):
        self.b = builder
        self.consts: Dict[Any, np.ndarray] = {}
        self.syms: Dict[Any, str] = {}

    def is_const(self, v) -> bool:
        return type(v).__name__ == "Literal" or v in self.consts

    def cval(self, v) -> np.ndarray:
        if type(v).__name__ == "Literal":
            return np.asarray(v.val)
        return self.consts[v]

    def sym(self, v) -> str:
        """Graph symbol for a var, materializing constants as initializers."""
        if self.is_const(v):
            return self.b.const(_np_compat(np.asarray(self.cval(v))), "w")
        return self.syms[v]


def _cpu_device():
    """The host CPU device, for cheap constant-fold executions."""
    global _CPU0
    if _CPU0 is None:
        _CPU0 = jax.devices("cpu")[0]
    return _CPU0


_CPU0 = None


def _np_compat(arr: np.ndarray) -> np.ndarray:
    """bf16 constants stay bf16 (TensorProto BFLOAT16): converting weights to
    fp32 while activations cast to bf16 would make Conv/Mul type-inconsistent
    for strict ONNX consumers."""
    return np.asarray(arr)


def _onnx_dt(dtype) -> int:
    return W.np_to_onnx_dtype(np.dtype(dtype))


# ---------------------------------------------------------------------------
# primitive handlers: fn(ctx, eqn, in_syms) -> list of output syms

_ELEMENTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
    "exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
    "sqrt": "Sqrt", "sign": "Sign", "neg": "Neg", "abs": "Abs",
    "floor": "Floor", "ceil": "Ceil", "round": "Round",
    "sin": "Sin", "cos": "Cos", "erf": "Erf",
    "gt": "Greater", "lt": "Less", "ge": "GreaterOrEqual",
    "le": "LessOrEqual", "eq": "Equal",
}

_REDUCE_ATTR = {"reduce_max": "ReduceMax", "reduce_min": "ReduceMin",
                "reduce_prod": "ReduceProd"}


def _perm_transpose(b: GraphBuilder, x: str, perm: Sequence[int]) -> str:
    if list(perm) == list(range(len(perm))):
        return x
    return b.node("Transpose", [x], perm=list(perm))


def _handle_conv(ctx: _Ctx, eqn, ins):
    b = ctx.b
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    nsp = len(lhs_spec) - 2
    if nsp != 2:
        raise NotImplementedError(f"conv rank {nsp + 2} unsupported in ONNX export")
    if tuple(p.get("lhs_dilation") or (1,) * nsp) != (1,) * nsp:
        raise NotImplementedError(
            "transposed convolution (lhs_dilation != 1) not supported by the "
            "ONNX exporter yet; export this family via stablehlo/tflite"
        )
    if p.get("batch_group_count", 1) != 1:
        raise NotImplementedError("batch_group_count != 1")

    x = _perm_transpose(b, ins[0], (lhs_spec[0], lhs_spec[1], *lhs_spec[2:]))
    # weights: constant in practice -> pre-transpose the initializer
    wvar = eqn.invars[1]
    rhs_perm = (rhs_spec[0], rhs_spec[1], *rhs_spec[2:])
    if ctx.is_const(wvar):
        wv = np.transpose(_np_compat(ctx.cval(wvar)), rhs_perm)
        w = b.const(np.ascontiguousarray(wv), "w")
    else:
        w = _perm_transpose(b, ins[1], rhs_perm)

    pads = list(p["padding"])  # [(lo,hi)] per spatial
    attrs = dict(
        strides=list(p["window_strides"]),
        dilations=list(p.get("rhs_dilation") or (1,) * nsp),
        group=int(p.get("feature_group_count", 1)),
        pads=[pads[0][0], pads[1][0], pads[0][1], pads[1][1]],
    )
    y = b.node("Conv", [x, w], **attrs)
    # back to the jaxpr's output layout
    out_rank = nsp + 2
    inv = [0] * out_rank
    for logical, physical in enumerate((out_spec[0], out_spec[1], *out_spec[2:])):
        inv[physical] = logical
    return [_perm_transpose(b, y, inv)]


def _handle_reduce_window_max(ctx: _Ctx, eqn, ins):
    b = ctx.b
    p = eqn.params
    wd = tuple(p["window_dimensions"])
    ws = tuple(p["window_strides"])
    pad = tuple(tuple(q) for q in p["padding"])
    if tuple(p.get("base_dilation") or ()) not in ((), (1,) * len(wd)):
        raise NotImplementedError("reduce_window base_dilation")
    if tuple(p.get("window_dilation") or ()) not in ((), (1,) * len(wd)):
        raise NotImplementedError("reduce_window window_dilation")
    rank = len(wd)
    sp = [i for i, k in enumerate(wd) if k != 1] or [rank - 2, rank - 1]
    if rank != 4 or len(sp) > 2:
        raise NotImplementedError(f"reduce_window_max window {wd}")
    while len(sp) < 2:  # degenerate 1-axis pool
        cand = [i for i in (rank - 2, rank - 1) if i not in sp and wd[i] == 1]
        sp.append(cand[0])
    sp = sorted(sp)
    non_sp = [i for i in range(rank) if i not in sp]
    perm = non_sp + sp  # (N, C, H, W)
    x = _perm_transpose(b, ins[0], perm)
    y = b.node(
        "MaxPool", [x],
        kernel_shape=[wd[i] for i in sp],
        strides=[ws[i] for i in sp],
        pads=[pad[sp[0]][0], pad[sp[1]][0], pad[sp[0]][1], pad[sp[1]][1]],
    )
    inv = [0] * rank
    for logical, physical in enumerate(perm):
        inv[physical] = logical
    return [_perm_transpose(b, y, inv)]


def _einsum_letters(n: int, start: int = 0) -> List[str]:
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    return list(alphabet[start:start + n])


def _handle_dot_general(ctx: _Ctx, eqn, ins):
    b = ctx.b
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lrank = len(eqn.invars[0].aval.shape)
    rrank = len(eqn.invars[1].aval.shape)
    letters = iter(_einsum_letters(52))
    lhs = [None] * lrank
    rhs = [None] * rrank
    for i, j in zip(lb, rb):
        c = next(letters)
        lhs[i] = rhs[j] = c
    for i, j in zip(lc, rc):
        c = next(letters)
        lhs[i] = rhs[j] = c
    for i in range(lrank):
        if lhs[i] is None:
            lhs[i] = next(letters)
    for j in range(rrank):
        if rhs[j] is None:
            rhs[j] = next(letters)
    out = [lhs[i] for i in lb]
    out += [lhs[i] for i in range(lrank) if i not in lb and i not in lc]
    out += [rhs[j] for j in range(rrank) if j not in rb and j not in rc]
    eqn_str = f"{''.join(lhs)},{''.join(rhs)}->{''.join(out)}"
    return [b.node("Einsum", list(ins), equation=eqn_str)]


def _handle_broadcast_in_dim(ctx: _Ctx, eqn, ins):
    b = ctx.b
    shape = list(eqn.params["shape"])
    bcd = list(eqn.params["broadcast_dimensions"])
    in_shape = list(eqn.invars[0].aval.shape)
    mid = [1] * len(shape)
    for axis, size in zip(bcd, in_shape):
        mid[axis] = size
    x = ins[0]
    if mid != in_shape or len(mid) != len(in_shape):
        x = b.node("Reshape", [x, b.i64(mid)])
    if mid != shape:
        x = b.node("Expand", [x, b.i64(shape)])
    return [x]


def _gather_is_take_along_axis(eqn) -> Optional[int]:
    """Recognize the jnp.take_along_axis lowering: one collapsed slice dim,
    slice_sizes all 1 on it and full elsewhere via batching dims."""
    d = eqn.params["dimension_numbers"]
    operand = eqn.invars[0].aval.shape
    ss = tuple(eqn.params["slice_sizes"])
    ob = tuple(getattr(d, "operand_batching_dims", ()) or ())
    if (
        len(d.start_index_map) == 1
        and d.collapsed_slice_dims == d.start_index_map
        and not d.offset_dims
        and len(ob) == len(operand) - 1
        and all(s == 1 for s in ss)
    ):
        return d.start_index_map[0]
    return None


def _handle_gather(ctx: _Ctx, eqn, ins):
    b = ctx.b
    d = eqn.params["dimension_numbers"]
    operand_shape = tuple(eqn.invars[0].aval.shape)
    idx_shape = tuple(eqn.invars[1].aval.shape)
    ss = tuple(eqn.params["slice_sizes"])
    ob = tuple(getattr(d, "operand_batching_dims", ()) or ())
    sb = tuple(getattr(d, "start_indices_batching_dims", ()) or ())
    out_shape = tuple(eqn.outvars[0].aval.shape)

    idx64 = b.node("Cast", [ins[1]], to=W.INT64)

    axis = _gather_is_take_along_axis(eqn)
    if axis is not None and ob and sb:
        # batched take_along_axis: GatherElements over `axis` with indices
        # broadcast/reshaped to the output shape
        idx = b.node("Reshape", [idx64, b.i64(list(out_shape) or [1])])
        y = b.node("GatherElements", [ins[0], idx], axis=int(axis))
        return [y]

    if (
        not ob and not sb
        and len(d.start_index_map) == 1
        and d.collapsed_slice_dims == d.start_index_map
        and idx_shape and idx_shape[-1] == 1
    ):
        # x[idx] along a single axis: Gather
        axis = d.start_index_map[0]
        ok_slices = all(
            s == operand_shape[i] for i, s in enumerate(ss) if i != axis
        ) and ss[axis] == 1
        if ok_slices:
            idx = b.node("Reshape", [idx64, b.i64(list(idx_shape[:-1]) or [1])])
            y = b.node("Gather", [ins[0], idx], axis=int(axis))
            # jax output: batch dims then offset dims (uncollapsed full slices)
            return [_reshape_to(b, y, out_shape)]

    raise NotImplementedError(
        f"gather pattern not supported by ONNX export: dnums={d} "
        f"slice_sizes={ss} operand={operand_shape} indices={idx_shape}"
    )


def _reshape_to(b: GraphBuilder, x: str, shape: Tuple[int, ...]) -> str:
    return b.node("Reshape", [x, b.i64(list(shape) or [1])])


def _handle_select_n(ctx: _Ctx, eqn, ins):
    if len(eqn.invars) != 3:
        raise NotImplementedError("select_n with >2 cases")
    pred = eqn.invars[0]
    if pred.aval.dtype != np.bool_:
        raise NotImplementedError("select_n with non-bool predicate")
    # select_n(pred, on_false, on_true) -> Where(pred, on_true, on_false)
    return [ctx.b.node("Where", [ins[0], ins[2], ins[1]])]


def _handle_iota(ctx: _Ctx, eqn, ins):
    p = eqn.params
    shape = tuple(p["shape"])
    dim = p["dimension"]
    rng = np.arange(shape[dim], dtype=np.dtype(p["dtype"]))
    arr = np.broadcast_to(
        rng.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape
    )
    return [ctx.b.const(np.ascontiguousarray(_np_compat(arr)), "iota")]


def _translate_eqn(ctx: _Ctx, eqn) -> None:
    b = ctx.b
    prim = eqn.primitive.name

    if prim in ("jit", "pjit", "closed_call", "core_call", "remat2", "remat",
                "checkpoint"):
        # Always recurse (even when fully constant): folding inner equations
        # one-by-one hits XLA's eager per-primitive cache instead of
        # compiling each folded subgraph as a fresh executable. remat is an
        # identity at inference: translate its body inline.
        closed = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
        _translate_subjaxpr(ctx, closed, eqn.invars, eqn.outvars)
        return
    if prim in ("custom_jvp_call", "custom_vjp_call", "custom_vjp_call_jaxpr"):
        closed = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
        _translate_subjaxpr(ctx, closed, eqn.invars, eqn.outvars)
        return

    # ---- constant folding -------------------------------------------------
    if all(ctx.is_const(v) for v in eqn.invars):
        big_expand = prim in ("broadcast_in_dim", "expand_dims") and (
            math.prod(eqn.outvars[0].aval.shape)
            * eqn.outvars[0].aval.dtype.itemsize
            > _EXPAND_FOLD_LIMIT
        )
        if not big_expand:
            # fold on the CPU backend: tiny eager executions over a TPU
            # tunnel pay ~100ms RTT each and would dominate export time
            with jax.default_device(_cpu_device()):
                vals = [jnp.asarray(ctx.cval(v)) for v in eqn.invars]
                subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
                out = eqn.primitive.bind(*subfuns, *vals, **bind_params)
            out = out if eqn.primitive.multiple_results else [out]
            for var, val in zip(eqn.outvars, out):
                ctx.consts[var] = np.asarray(jax.device_get(val))
            return

    ins = [ctx.sym(v) for v in eqn.invars]
    outs: Optional[List[str]] = None

    if prim in _ELEMENTWISE:
        op = _ELEMENTWISE[prim]
        outs = [b.node(op, ins)]
    elif prim == "ne":
        outs = [b.node("Not", [b.node("Equal", ins)])]
    elif prim == "not":
        outs = [b.node("Not", ins)]
    elif prim == "and":
        if eqn.invars[0].aval.dtype != np.bool_:
            raise NotImplementedError("bitwise and on ints")
        outs = [b.node("And", ins)]
    elif prim == "or":
        if eqn.invars[0].aval.dtype != np.bool_:
            raise NotImplementedError("bitwise or on ints")
        outs = [b.node("Or", ins)]
    elif prim == "xor":
        if eqn.invars[0].aval.dtype != np.bool_:
            raise NotImplementedError("bitwise xor on ints")
        outs = [b.node("Xor", ins)]
    elif prim == "rsqrt":
        outs = [b.node("Reciprocal", [b.node("Sqrt", ins)])]
    elif prim == "rem":
        outs = [b.node("Mod", ins, fmod=1)]
    elif prim == "integer_pow":
        y = eqn.params["y"]
        dt = eqn.invars[0].aval.dtype
        e = b.const(np.asarray(y, dt), "pow_e")
        outs = [b.node("Pow", [ins[0], e])]
    elif prim == "clamp":
        # lax.clamp(min, x, max) -> Clip(x, min, max)
        outs = [b.node("Clip", [ins[1], ins[0], ins[2]])]
    elif prim == "stop_gradient" or prim == "copy":
        outs = [b.node("Identity", ins)]
    elif prim == "convert_element_type":
        outs = [b.node("Cast", ins, to=_onnx_dt(eqn.params["new_dtype"]))]
    elif prim == "reshape":
        if eqn.params.get("dimensions") is not None:
            perm = list(eqn.params["dimensions"])
            x = _perm_transpose(b, ins[0], perm)
            outs = [_reshape_to(b, x, eqn.outvars[0].aval.shape)]
        else:
            outs = [_reshape_to(b, ins[0], eqn.outvars[0].aval.shape)]
    elif prim in ("squeeze", "expand_dims"):
        outs = [_reshape_to(b, ins[0], eqn.outvars[0].aval.shape)]
    elif prim == "transpose":
        outs = [_perm_transpose(b, ins[0], list(eqn.params["permutation"]))]
    elif prim == "concatenate":
        outs = [b.node("Concat", ins, axis=int(eqn.params["dimension"]))]
    elif prim == "slice":
        starts = list(eqn.params["start_indices"])
        ends = list(eqn.params["limit_indices"])
        steps = list(eqn.params.get("strides") or [1] * len(starts))
        axes = list(range(len(starts)))
        outs = [b.node("Slice", [ins[0], b.i64(starts), b.i64(ends),
                                 b.i64(axes), b.i64(steps)])]
    elif prim == "rev":
        dims = list(eqn.params["dimensions"])
        shape = eqn.invars[0].aval.shape
        starts = [shape[d] - 1 for d in dims]
        ends = [-(shape[d] + 1) for d in dims]
        steps = [-1] * len(dims)
        outs = [b.node("Slice", [ins[0], b.i64(starts), b.i64(ends),
                                 b.i64(dims), b.i64(steps)])]
    elif prim == "split":
        sizes = list(eqn.params["sizes"])
        axis = int(eqn.params["axis"])
        res = b.node("Split", [ins[0], b.i64(sizes)], n_out=len(sizes),
                     axis=axis)
        outs = list(res) if isinstance(res, tuple) else [res]
    elif prim == "broadcast_in_dim":
        outs = _handle_broadcast_in_dim(ctx, eqn, ins)
    elif prim == "iota":
        outs = _handle_iota(ctx, eqn, ins)
    elif prim == "conv_general_dilated":
        outs = _handle_conv(ctx, eqn, ins)
    elif prim == "dot_general":
        outs = _handle_dot_general(ctx, eqn, ins)
    elif prim == "reduce_window_max":
        outs = _handle_reduce_window_max(ctx, eqn, ins)
    elif prim == "reduce_sum":
        axes = b.i64(list(eqn.params["axes"]))
        outs = [b.node("ReduceSum", [ins[0], axes], keepdims=0)]
    elif prim in _REDUCE_ATTR:
        outs = [b.node(_REDUCE_ATTR[prim], ins,
                       axes=list(eqn.params["axes"]), keepdims=0)]
    elif prim in ("reduce_and", "reduce_or"):
        # opset-13 ReduceMin/Max exclude bool: reduce in int32, recast
        op = "ReduceMin" if prim == "reduce_and" else "ReduceMax"
        as_int = b.node("Cast", ins, to=W.INT32)
        red = b.node(op, [as_int], axes=list(eqn.params["axes"]), keepdims=0)
        outs = [b.node("Cast", [red], to=W.BOOL)]
    elif prim == "argmax" or prim == "argmin":
        op = "ArgMax" if prim == "argmax" else "ArgMin"
        (axis,) = eqn.params["axes"]
        y = b.node(op, ins, axis=int(axis), keepdims=0)
        outs = [b.node("Cast", [y], to=_onnx_dt(eqn.params["index_dtype"]))]
    elif prim == "top_k":
        k = int(eqn.params["k"])
        vals, idx = b.node("TopK", [ins[0], b.i64([k])], n_out=2,
                           axis=-1, largest=1, sorted=1)
        idx32 = b.node("Cast", [idx], to=_onnx_dt(eqn.outvars[1].aval.dtype))
        outs = [vals, idx32]
    elif prim == "sort":
        # lax.sort (ascending, keys + payloads) -> full-length TopK with
        # largest=0 (ascending) + GatherElements for each payload operand
        if eqn.params.get("num_keys", 1) != 1:
            raise NotImplementedError("sort with multiple keys")
        dim = int(eqn.params["dimension"])
        size = int(eqn.invars[0].aval.shape[dim])
        vals, idx = b.node("TopK", [ins[0], b.i64([size])], n_out=2,
                           axis=dim, largest=0, sorted=1)
        outs = [vals]
        for payload in ins[1:]:
            outs.append(b.node("GatherElements", [payload, idx], axis=dim))
    elif prim == "gather":
        outs = _handle_gather(ctx, eqn, ins)
    elif prim == "select_n":
        outs = _handle_select_n(ctx, eqn, ins)
    elif prim == "dynamic_slice":
        starts = eqn.invars[1:]
        if not all(ctx.is_const(s) for s in starts):
            raise NotImplementedError("dynamic_slice with traced starts")
        st = [int(ctx.cval(s)) for s in starts]
        shape = eqn.invars[0].aval.shape
        sizes = eqn.params["slice_sizes"]
        st = [min(max(s, 0), shape[i] - sizes[i]) for i, s in enumerate(st)]
        ends = [s + z for s, z in zip(st, sizes)]
        outs = [b.node("Slice", [ins[0], b.i64(st), b.i64(ends),
                                 b.i64(list(range(len(st)))),
                                 b.i64([1] * len(st))])]
    elif prim == "pad":
        lo_hi = eqn.params["padding_config"]
        if any(interior for (_, _, interior) in lo_hi):
            raise NotImplementedError("interior padding")
        pads = [p[0] for p in lo_hi] + [p[1] for p in lo_hi]
        if min(pads) < 0:
            raise NotImplementedError("negative padding")
        outs = [b.node("Pad", [ins[0], b.i64(pads), ins[1]], mode="constant")]
    elif prim == "cumsum":
        axis = b.const(np.asarray(int(eqn.params["axis"]), np.int64), "ax")
        rev = bool(eqn.params.get("reverse", False))
        outs = [b.node("CumSum", [ins[0], axis], exclusive=0, reverse=int(rev))]
    elif prim == "is_finite":
        inf = b.node("Not", [b.node("IsInf", ins)])
        nan = b.node("Not", [b.node("IsNaN", ins)])
        outs = [b.node("And", [inf, nan])]
    elif prim == "square":
        outs = [b.node("Mul", [ins[0], ins[0]])]
    else:
        raise NotImplementedError(
            f"JAX primitive {prim!r} has no ONNX translation "
            f"(params={list(eqn.params)})"
        )

    for var, sym in zip(eqn.outvars, outs):
        ctx.syms[var] = sym


def _translate_subjaxpr(ctx: _Ctx, closed, invars, outvars) -> None:
    # ClosedJaxpr (pjit/custom_jvp) or plain open Jaxpr (remat2)
    jaxpr = getattr(closed, "jaxpr", closed)
    consts = getattr(closed, "consts", ())
    inner = _Ctx(ctx.b)
    for cv, cval in zip(jaxpr.constvars, consts):
        inner.consts[cv] = ctx.b.fetch(cval)
    for iv, ov in zip(jaxpr.invars, invars):
        if ctx.is_const(ov):
            inner.consts[iv] = ctx.cval(ov)
        else:
            inner.syms[iv] = ctx.sym(ov)
    for eqn in jaxpr.eqns:
        _translate_eqn(inner, eqn)
    for outer_v, inner_v in zip(outvars, jaxpr.outvars):
        if type(inner_v).__name__ == "Literal":
            ctx.consts[outer_v] = np.asarray(inner_v.val)
        elif inner.is_const(inner_v):
            ctx.consts[outer_v] = inner.cval(inner_v)
        else:
            ctx.syms[outer_v] = inner.syms[inner_v]


def export_onnx(
    fn,
    example_inputs: Sequence[jax.Array],
    *,
    input_names: Optional[Sequence[str]] = None,
    output_names: Optional[Sequence[str]] = None,
    model_name: str = "yolov10_3d_tpu",
    opset: int = 13,
    nchw_input: bool = True,
    metadata: Optional[Dict[str, str]] = None,
) -> bytes:
    """Trace ``fn(*example_inputs)`` and translate the jaxpr to a serialized
    ONNX ModelProto.

    nchw_input: when True, each 4D (B,H,W,C) image input is exposed to the
    ONNX graph as (B,C,H,W) — the ONNX ecosystem convention — with a
    Transpose inserted at graph entry.
    """
    closed = jax.make_jaxpr(fn)(*example_inputs)
    jaxpr = closed.jaxpr
    b = GraphBuilder()
    ctx = _Ctx(b)
    # one batched host transfer for all weights (per-const device_get over a
    # TPU tunnel costs ~100ms RTT each)
    host_consts = jax.device_get(list(closed.consts))
    for cv, cval, host in zip(jaxpr.constvars, closed.consts, host_consts):
        arr = np.asarray(host)
        b._fetch_cache[id(cval)] = arr
        ctx.consts[cv] = arr

    input_names = list(input_names or [f"input_{i}" for i in range(len(jaxpr.invars))])
    graph_inputs: List[W.ValueInfo] = []
    for name, var in zip(input_names, jaxpr.invars):
        aval = var.aval
        shape = tuple(int(s) for s in aval.shape)
        if nchw_input and len(shape) == 4 and shape[-1] in (1, 3):
            nchw_shape = (shape[0], shape[3], shape[1], shape[2])
            graph_inputs.append(W.ValueInfo(name, _onnx_dt(aval.dtype), nchw_shape))
            ctx.syms[var] = b.node("Transpose", [name], perm=[0, 2, 3, 1])
        else:
            graph_inputs.append(W.ValueInfo(name, _onnx_dt(aval.dtype), shape))
            ctx.syms[var] = name

    for eqn in jaxpr.eqns:
        _translate_eqn(ctx, eqn)

    output_names = list(
        output_names or [f"output_{i}" for i in range(len(jaxpr.outvars))]
    )
    graph_outputs: List[W.ValueInfo] = []
    for name, var in zip(output_names, jaxpr.outvars):
        aval = var.aval
        if type(var).__name__ == "Literal" or ctx.is_const(var):
            sym = b.const(_np_compat(np.asarray(ctx.cval(var))), "out_const")
            b.node("Identity", [sym], out_names=[name])
        else:
            b.node("Identity", [ctx.syms[var]], out_names=[name])
        graph_outputs.append(
            W.ValueInfo(name, _onnx_dt(aval.dtype),
                        tuple(int(s) for s in aval.shape))
        )

    # prune initializers never consumed by a node (e.g. pre-transpose conv
    # weights materialized by the generic input pass, superseded by the
    # OIHW copies the conv handler ships)
    used = {name for node in b.nodes for name in node.inputs}
    initializers = [t for t in b.initializers if t.name in used]

    graph = W.Graph(
        name=model_name,
        nodes=b.nodes,
        inputs=graph_inputs,
        outputs=graph_outputs,
        initializers=initializers,
    )
    model = W.Model(graph=graph, opset=opset, metadata=dict(metadata or {}))
    return model.encode()
