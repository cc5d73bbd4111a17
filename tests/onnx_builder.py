"""Minimal ONNX protobuf *writer* for tests (inverse of onnx_exec's reader).

Builds ModelProto bytes from a node list — enough to construct synthetic
graphs exercising every op the executor implements, without the onnx
package (unavailable in this environment).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

_ONNX_DTYPE = {
    np.dtype("float32"): 1, np.dtype("uint8"): 2, np.dtype("int8"): 3,
    np.dtype("uint16"): 4, np.dtype("int16"): 5, np.dtype("int32"): 6,
    np.dtype("int64"): 7, np.dtype("bool"): 9, np.dtype("float16"): 10,
    np.dtype("float64"): 11,
}


def _varint(v: int) -> bytes:
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _vi(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _f32(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b""
    for d in arr.shape:
        out += _vi(1, d)
    out += _vi(2, _ONNX_DTYPE[arr.dtype])
    out += _ld(8, name.encode())
    out += _ld(9, np.ascontiguousarray(arr).tobytes())
    return out


class SubGraph:
    """Marker wrapper so attr() emits a GraphProto payload (field 6)."""

    def __init__(self, data: bytes):
        self.data = data


def graph_proto(
    nodes: List[bytes],
    inputs: List[Tuple[str, int, Sequence[Optional[int]]]],
    outputs: List[Tuple[str, int, Sequence[Optional[int]]]],
    initializers: Optional[Dict[str, np.ndarray]] = None,
    name: bytes = b"subgraph",
) -> SubGraph:
    # list+join, not bytes += : bench bundles carry hundreds of MB of
    # initializers and quadratic concatenation would dominate
    parts = [_ld(1, n) for n in nodes]
    parts.append(_ld(2, name))
    for nm, arr in (initializers or {}).items():
        parts.append(_ld(5, tensor_proto(nm, arr)))
    for nm, et, sh in inputs:
        parts.append(_ld(11, value_info(nm, et, sh)))
    for nm, et, sh in outputs:
        parts.append(_ld(12, value_info(nm, et, sh)))
    return SubGraph(b"".join(parts))


def attr(name: str, value: Any) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, SubGraph):
        out += _ld(6, value.data) + _vi(20, 5)
    elif isinstance(value, bytes):
        out += _ld(4, value) + _vi(20, 3)
    elif isinstance(value, str):
        out += _ld(4, value.encode()) + _vi(20, 3)
    elif isinstance(value, bool) or isinstance(value, (int, np.integer)):
        out += _vi(3, int(value)) + _vi(20, 2)
    elif isinstance(value, float):
        out += _f32(2, value) + _vi(20, 1)
    elif isinstance(value, np.ndarray):
        out += _ld(5, tensor_proto("", value)) + _vi(20, 4)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            for v in value:
                out += _vi(8, int(v))
            out += _vi(20, 7)
        elif all(isinstance(v, float) for v in value):
            for v in value:
                out += _f32(7, v)
            out += _vi(20, 6)
        elif all(isinstance(v, (str, bytes)) for v in value):
            for v in value:
                out += _ld(9, v.encode() if isinstance(v, str) else v)
            out += _vi(20, 8)
        else:
            raise TypeError(f"attr list {name}: {value}")
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    return out


def node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
         name: str = "", **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += _ld(1, i.encode())
    for o in outputs:
        out += _ld(2, o.encode())
    out += _ld(3, (name or op_type).encode())
    out += _ld(4, op_type.encode())
    for k, v in attrs.items():
        out += _ld(5, attr(k, v))
    return out


def value_info(name: str, elem_type: int = 1,
               shape: Optional[Sequence[Optional[int]]] = None) -> bytes:
    dims = b""
    for d in (shape or []):
        if d is None:
            dims += _ld(1, _ld(2, b"N"))  # dim_param
        else:
            dims += _ld(1, _vi(1, d))
    tensor_type = _vi(1, elem_type) + _ld(2, dims)
    return _ld(1, name.encode()) + _ld(2, _ld(1, tensor_type))


def model_proto(
    nodes: List[bytes],
    inputs: List[Tuple[str, int, Sequence[Optional[int]]]],
    outputs: List[Tuple[str, int, Sequence[Optional[int]]]],
    initializers: Optional[Dict[str, np.ndarray]] = None,
    opset: int = 17,
) -> bytes:
    g = graph_proto(nodes, inputs, outputs, initializers,
                    name=b"test-graph").data
    return b"".join([_vi(1, 8),  # ir_version
                     _ld(7, g),
                     _ld(8, _ld(1, b"") + _vi(2, opset))])  # opset_import


def write_model(path, *args, **kwargs):
    data = model_proto(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return path
