"""Minimal ONNX protobuf wire-format writer/reader (no ``onnx`` dependency).

The reference exports ONNX through the ``onnx`` python package
(reference: ultralytics/engine/exporter.py:353 ``export_onnx`` ->
``torch.onnx.export``). That package is unavailable offline, but an .onnx
file is nothing more than a serialized ``ModelProto`` protobuf message, and
protobuf's wire format is a small public spec (varint tags + length-delimited
submessages). This module hand-encodes exactly the message subset an
inference graph needs — ModelProto / GraphProto / NodeProto / TensorProto /
AttributeProto / ValueInfoProto — with field numbers from the public
onnx.proto schema, plus a matching decoder used by the in-repo numpy runtime
(``nn/onnx_runtime.py``) and the round-trip tests.

Messages are plain dataclasses; ``encode_model`` produces bytes that any
standard ONNX consumer (onnxruntime, netron, onnx.checker) parses.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

# -- ONNX TensorProto.DataType enum (public onnx.proto) ----------------------
FLOAT = 1
UINT8 = 2
INT8 = 3
UINT16 = 4
INT16 = 5
INT32 = 6
INT64 = 7
STRING = 8
BOOL = 9
FLOAT16 = 10
DOUBLE = 11
UINT32 = 12
UINT64 = 13
BFLOAT16 = 16

_NP2ONNX = {
    np.dtype(np.float32): FLOAT,
    np.dtype(np.uint8): UINT8,
    np.dtype(np.int8): INT8,
    np.dtype(np.uint16): UINT16,
    np.dtype(np.int16): INT16,
    np.dtype(np.int32): INT32,
    np.dtype(np.int64): INT64,
    np.dtype(np.bool_): BOOL,
    np.dtype(np.float16): FLOAT16,
    np.dtype(np.float64): DOUBLE,
    np.dtype(np.uint32): UINT32,
    np.dtype(np.uint64): UINT64,
}
try:  # bf16 models are the TPU norm; ml_dtypes ships with jax
    import ml_dtypes

    _NP2ONNX[np.dtype(ml_dtypes.bfloat16)] = BFLOAT16
except ImportError:  # pragma: no cover
    pass
_ONNX2NP = {v: k for k, v in _NP2ONNX.items()}


def np_to_onnx_dtype(dt) -> int:
    dt = np.dtype(dt)
    if dt not in _NP2ONNX:
        raise ValueError(f"dtype {dt} has no ONNX TensorProto mapping")
    return _NP2ONNX[dt]


def onnx_to_np_dtype(code: int) -> np.dtype:
    if code not in _ONNX2NP:
        raise ValueError(f"ONNX data_type {code} unsupported by this reader")
    return _ONNX2NP[code]


# -- wire-format primitives ---------------------------------------------------

def _varint(n: int) -> bytes:
    """Unsigned LEB128. Negative ints are encoded as 64-bit two's complement
    (protobuf int64 semantics: always 10 bytes for negatives)."""
    if n < 0:
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _f_varint(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(int(value))


def _f_bytes(field: int, data: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(data)) + data


def _f_string(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode("utf-8"))


def _f_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _f_packed_varints(field: int, values) -> bytes:
    if not len(values):
        return b""
    payload = b"".join(_varint(int(v)) for v in values)
    return _f_bytes(field, payload)


# -- message dataclasses -------------------------------------------------------

@dataclasses.dataclass
class Tensor:
    """onnx.TensorProto: dims=1, data_type=2, name=8, raw_data=9."""
    name: str
    array: np.ndarray

    def encode(self) -> bytes:
        a = np.ascontiguousarray(self.array)
        out = _f_packed_varints(1, a.shape)
        out += _f_varint(2, np_to_onnx_dtype(a.dtype))
        out += _f_string(8, self.name)
        out += _f_bytes(9, a.tobytes())  # raw_data is always little-endian
        return out


@dataclasses.dataclass
class Attribute:
    """onnx.AttributeProto. type=20 enum: FLOAT=1 INT=2 STRING=3 TENSOR=4
    FLOATS=6 INTS=7 STRINGS=8."""
    name: str
    value: Union[float, int, str, bytes, Tensor, list, tuple, np.ndarray]

    def encode(self) -> bytes:
        out = _f_string(1, self.name)
        v = self.value
        if isinstance(v, Tensor):
            out += _f_bytes(5, v.encode()) + _f_varint(20, 4)
        elif isinstance(v, bool):
            out += _f_varint(3, int(v)) + _f_varint(20, 2)
        elif isinstance(v, (int, np.integer)):
            out += _f_varint(3, int(v)) + _f_varint(20, 2)
        elif isinstance(v, (float, np.floating)):
            out += _f_float(2, float(v)) + _f_varint(20, 1)
        elif isinstance(v, str):
            out += _f_bytes(4, v.encode("utf-8")) + _f_varint(20, 3)
        elif isinstance(v, bytes):
            out += _f_bytes(4, v) + _f_varint(20, 3)
        elif isinstance(v, (list, tuple, np.ndarray)):
            seq = list(v)
            if seq and isinstance(seq[0], (float, np.floating)):
                for x in seq:
                    out += _f_float(7, float(x))
                out += _f_varint(20, 6)
            else:  # ints (incl. empty list -> INTS)
                for x in seq:
                    out += _f_varint(8, int(x))
                out += _f_varint(20, 7)
        else:
            raise TypeError(f"attribute {self.name}: bad value {type(v)}")
        return out


@dataclasses.dataclass
class Node:
    """onnx.NodeProto: input=1, output=2, name=3, op_type=4, attribute=5."""
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    attributes: Dict[str, object] = dataclasses.field(default_factory=dict)

    def encode(self) -> bytes:
        out = b"".join(_f_string(1, s) for s in self.inputs)
        out += b"".join(_f_string(2, s) for s in self.outputs)
        if self.name:
            out += _f_string(3, self.name)
        out += _f_string(4, self.op_type)
        for k, v in self.attributes.items():
            out += _f_bytes(5, Attribute(k, v).encode())
        return out


@dataclasses.dataclass
class ValueInfo:
    """onnx.ValueInfoProto(name=1, type=2); TypeProto.tensor_type=1;
    TypeProto.Tensor(elem_type=1, shape=2); TensorShapeProto.dim=1;
    Dimension(dim_value=1, dim_param=2)."""
    name: str
    elem_type: int
    shape: Tuple[Union[int, str], ...]

    def encode(self) -> bytes:
        dims = b""
        for d in self.shape:
            if isinstance(d, str):
                dim = _f_string(2, d)
            else:
                dim = _f_varint(1, int(d))
            dims += _f_bytes(1, dim)
        tensor_type = _f_varint(1, self.elem_type) + _f_bytes(2, dims)
        type_proto = _f_bytes(1, tensor_type)
        return _f_string(1, self.name) + _f_bytes(2, type_proto)


@dataclasses.dataclass
class Graph:
    """onnx.GraphProto: node=1, name=2, initializer=5, input=11, output=12,
    value_info=13."""
    name: str
    nodes: List[Node]
    inputs: List[ValueInfo]
    outputs: List[ValueInfo]
    initializers: List[Tensor]

    def encode(self) -> bytes:
        parts = [_f_bytes(1, n.encode()) for n in self.nodes]
        parts.append(_f_string(2, self.name))
        parts.extend(_f_bytes(5, t.encode()) for t in self.initializers)
        parts.extend(_f_bytes(11, v.encode()) for v in self.inputs)
        parts.extend(_f_bytes(12, v.encode()) for v in self.outputs)
        return b"".join(parts)


@dataclasses.dataclass
class Model:
    """onnx.ModelProto: ir_version=1, producer_name=2, producer_version=3,
    opset_import=8 (OperatorSetIdProto: domain=1, version=2), graph=7,
    metadata_props=14 (StringStringEntryProto: key=1, value=2)."""
    graph: Graph
    opset: int = 13
    ir_version: int = 8
    producer_name: str = "yolov10_3d_tpu"
    producer_version: str = "1.0"
    metadata: Dict[str, str] = dataclasses.field(default_factory=dict)

    def encode(self) -> bytes:
        out = _f_varint(1, self.ir_version)
        out += _f_string(2, self.producer_name)
        out += _f_string(3, self.producer_version)
        out += _f_bytes(7, self.graph.encode())
        opset = _f_string(1, "") + _f_varint(2, self.opset)
        out += _f_bytes(8, opset)
        for k, v in self.metadata.items():
            out += _f_bytes(14, _f_string(1, k) + _f_string(2, v))
        return out


# -- decoder -------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) where value is int (wt 0),
    bytes (wt 2), or raw 4/8-byte chunks (wt 5/1)."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos:pos + 4]
            pos += 4
        elif wt == 1:
            v = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_packed_int64(wt: int, v) -> List[int]:
    if wt == 0:
        return [_signed64(v)]
    out, pos = [], 0
    while pos < len(v):
        x, pos = _read_varint(v, pos)
        out.append(_signed64(x))
    return out


def decode_tensor(buf: bytes) -> Tensor:
    dims: List[int] = []
    dtype = FLOAT
    name = ""
    raw: Optional[bytes] = None
    float_data: List[float] = []
    int_data: List[int] = []
    for field, wt, v in _iter_fields(buf):
        if field == 1:
            dims.extend(_decode_packed_int64(wt, v))
        elif field == 2:
            dtype = v
        elif field == 8:
            name = v.decode("utf-8")
        elif field == 9:
            raw = v
        elif field == 4:  # packed float_data fallback
            if wt == 5:
                float_data.append(struct.unpack("<f", v)[0])
            else:
                float_data.extend(np.frombuffer(v, "<f4").tolist())
        elif field in (5, 7):  # int32_data / int64_data
            int_data.extend(_decode_packed_int64(wt, v))
    np_dt = onnx_to_np_dtype(dtype)
    if raw is not None:
        arr = np.frombuffer(raw, np_dt).reshape(dims).copy()
    elif float_data:
        arr = np.asarray(float_data, np_dt).reshape(dims)
    else:
        arr = np.asarray(int_data, np_dt).reshape(dims)
    return Tensor(name, arr)


def decode_attribute(buf: bytes):
    name = ""
    atype = None
    f = i = s = t = None
    floats: List[float] = []
    ints: List[int] = []
    for field, wt, v in _iter_fields(buf):
        if field == 1:
            name = v.decode("utf-8")
        elif field == 2:
            f = struct.unpack("<f", v)[0]
        elif field == 3:
            i = _signed64(v)
        elif field == 4:
            s = v
        elif field == 5:
            t = decode_tensor(v)
        elif field == 7:
            if wt == 5:
                floats.append(struct.unpack("<f", v)[0])
            else:
                floats.extend(np.frombuffer(v, "<f4").tolist())
        elif field == 8:
            ints.extend(_decode_packed_int64(wt, v))
        elif field == 20:
            atype = v
    if atype == 1:
        return name, f
    if atype == 2:
        return name, i
    if atype == 3:
        return name, s.decode("utf-8") if s is not None else ""
    if atype == 4:
        return name, t
    if atype == 6:
        return name, floats
    if atype == 7:
        return name, ints
    # untyped (some writers omit type=20): infer
    for cand in (i, f, t):
        if cand is not None:
            return name, cand
    if s is not None:
        return name, s.decode("utf-8", "replace")
    return name, ints or floats


def decode_node(buf: bytes) -> Node:
    node = Node(op_type="", inputs=[], outputs=[])
    for field, _, v in _iter_fields(buf):
        if field == 1:
            node.inputs.append(v.decode("utf-8"))
        elif field == 2:
            node.outputs.append(v.decode("utf-8"))
        elif field == 3:
            node.name = v.decode("utf-8")
        elif field == 4:
            node.op_type = v.decode("utf-8")
        elif field == 5:
            k, val = decode_attribute(v)
            node.attributes[k] = val
    return node


def decode_value_info(buf: bytes) -> ValueInfo:
    name = ""
    elem_type = FLOAT
    shape: List[Union[int, str]] = []
    for field, _, v in _iter_fields(buf):
        if field == 1:
            name = v.decode("utf-8")
        elif field == 2:
            for f2, _, v2 in _iter_fields(v):
                if f2 != 1:  # tensor_type
                    continue
                for f3, wt3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        elem_type = v3
                    elif f3 == 2:  # shape
                        for f4, _, v4 in _iter_fields(v3):
                            if f4 != 1:
                                continue
                            dim: Union[int, str] = 0
                            for f5, _, v5 in _iter_fields(v4):
                                if f5 == 1:
                                    dim = _signed64(v5) if isinstance(v5, int) else v5
                                elif f5 == 2:
                                    dim = v5.decode("utf-8")
                            shape.append(dim)
    return ValueInfo(name, elem_type, tuple(shape))


def decode_graph(buf: bytes) -> Graph:
    g = Graph(name="", nodes=[], inputs=[], outputs=[], initializers=[])
    for field, _, v in _iter_fields(buf):
        if field == 1:
            g.nodes.append(decode_node(v))
        elif field == 2:
            g.name = v.decode("utf-8")
        elif field == 5:
            g.initializers.append(decode_tensor(v))
        elif field == 11:
            g.inputs.append(decode_value_info(v))
        elif field == 12:
            g.outputs.append(decode_value_info(v))
    return g


def decode_model(buf: bytes) -> Model:
    graph = None
    opset = 13
    ir_version = 8
    producer = ""
    version = ""
    metadata: Dict[str, str] = {}
    for field, _, v in _iter_fields(buf):
        if field == 1:
            ir_version = v
        elif field == 2:
            producer = v.decode("utf-8")
        elif field == 3:
            version = v.decode("utf-8")
        elif field == 7:
            graph = decode_graph(v)
        elif field == 8:
            dom, ver = "", opset
            for f2, _, v2 in _iter_fields(v):
                if f2 == 1:
                    dom = v2.decode("utf-8")
                elif f2 == 2:
                    ver = v2
            if dom in ("", "ai.onnx"):
                opset = ver
        elif field == 14:
            k = val = ""
            for f2, _, v2 in _iter_fields(v):
                if f2 == 1:
                    k = v2.decode("utf-8")
                elif f2 == 2:
                    val = v2.decode("utf-8")
            metadata[k] = val
    if graph is None:
        raise ValueError("no GraphProto in model")
    return Model(graph=graph, opset=opset, ir_version=ir_version,
                 producer_name=producer, producer_version=version,
                 metadata=metadata)
