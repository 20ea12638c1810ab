"""Minimal ONNX protobuf reader, tested against a hand-encoded model
(no onnx/onnxscript packages in this environment, so the fixture writes
the wire format directly per the ONNX proto spec)."""
import numpy as np
import pytest


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes | int) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _tensor(name: str, arr: np.ndarray, raw: bool = True) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, d)
    dtype_code = {np.float32: 1, np.int64: 7, np.uint8: 2}[arr.dtype.type]
    msg += _field(2, 0, dtype_code)
    msg += _field(8, 2, name.encode())
    if raw:
        msg += _field(9, 2, arr.tobytes())
    elif arr.dtype.type is np.float32:
        msg += _field(4, 2, arr.astype("<f4").tobytes())  # packed float_data
    else:
        msg += _field(7, 2, arr.astype("<i8").tobytes())  # packed int64_data
    return msg


def _value_info(name: str) -> bytes:
    return _field(1, 2, name.encode())


@pytest.fixture(scope="module")
def onnx_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    weights = {
        "conv.weight": rng.standard_normal((8, 3, 3, 3)).astype(np.float32),
        "conv.bias": rng.standard_normal(8).astype(np.float32),
        "fc.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "shape_const": np.array([1, -1], dtype=np.int64),
    }
    graph = b""
    for i, (name, arr) in enumerate(weights.items()):
        graph += _field(5, 2, _tensor(name, arr, raw=(i % 2 == 0)))
    graph += _field(11, 2, _value_info("image"))
    graph += _field(12, 2, _value_info("logits"))
    model = _field(1, 0, 8)  # ir_version
    model += _field(7, 2, graph)
    path = tmp_path_factory.mktemp("onnx") / "net.onnx"
    path.write_bytes(model)
    return path, weights


def test_initializers_roundtrip(onnx_file):
    from rapiddoc_tpu.tools.onnx_reader import read_onnx_initializers

    path, weights = onnx_file
    inits = read_onnx_initializers(path)
    assert set(inits) == set(weights)
    for name, arr in weights.items():
        got = inits[name]
        assert got.shape == arr.shape, name
        assert np.allclose(got.astype(np.float64), arr.astype(np.float64)), name


def test_io_names(onnx_file):
    from rapiddoc_tpu.tools.onnx_reader import read_onnx_io_names

    path, _ = onnx_file
    inputs, outputs = read_onnx_io_names(path)
    assert inputs == ["image"]
    assert outputs == ["logits"]
