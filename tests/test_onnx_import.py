"""ONNX initializer extraction: round-trip against a hand-built protobuf."""

import struct

import numpy as np

from crispy_tpu.models.onnx_import import load_onnx_weights


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:  # varint field
    return _varint(field << 3) + _varint(value)


def _tensor(name: str, arr: np.ndarray, use_raw=True, dtype_code=None) -> bytes:
    codes = {"float32": 1, "float16": 10, "int64": 7, "int8": 3, "float64": 11}
    code = dtype_code or codes[str(arr.dtype)]
    msg = b""
    for d in arr.shape:
        msg += _vi(1, d)
    msg += _vi(2, code)
    msg += _ld(8, name.encode())
    if use_raw:
        msg += _ld(9, arr.tobytes())
    else:
        msg += _ld(4, arr.astype("<f4").tobytes())
    return msg


def _model(tensors) -> bytes:
    graph = b"".join(_ld(5, t) for t in tensors)
    return _ld(7, graph)


def test_roundtrip_raw_tensors(tmp_path, rng):
    w1 = rng.standard_normal((3, 4)).astype(np.float32)
    w2 = rng.integers(-100, 100, size=(2, 5)).astype(np.int8)
    w3 = rng.standard_normal((7,)).astype(np.float16)
    blob = _model([_tensor("enc.w", w1), _tensor("quant.w", w2), _tensor("h", w3)])
    p = tmp_path / "m.onnx"
    p.write_bytes(blob)
    out = load_onnx_weights(p)
    np.testing.assert_array_equal(out["enc.w"], w1)
    np.testing.assert_array_equal(out["quant.w"], w2)
    np.testing.assert_array_equal(out["h"], w3)


def test_float_data_field(tmp_path, rng):
    w = rng.standard_normal((2, 3)).astype(np.float32)
    blob = _model([_tensor("f", w, use_raw=False)])
    p = tmp_path / "m.onnx"
    p.write_bytes(blob)
    out = load_onnx_weights(p)
    np.testing.assert_array_equal(out["f"], w)


def test_extra_fields_skipped(tmp_path, rng):
    """Unknown model/graph fields (producer name, nodes, etc.) are ignored."""
    w = rng.standard_normal((4,)).astype(np.float32)
    graph = _ld(1, b"some-node-proto") + _ld(5, _tensor("w", w)) + _ld(2, b"name")
    blob = _ld(2, b"producer") + _vi(1, 8) + _ld(7, graph)
    p = tmp_path / "m.onnx"
    p.write_bytes(blob)
    out = load_onnx_weights(p)
    assert list(out) == ["w"]
    np.testing.assert_array_equal(out["w"], w)
