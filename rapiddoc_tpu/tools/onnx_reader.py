"""Minimal ONNX weight reader (no onnx package in this environment).

The reference's layout/table checkpoints are published as .onnx graphs
(reference: rapid_doc/model/layout/rapid_layout_self/configs/
default_models.yaml); converting them to flax trees only needs the
*initializers* (named weight tensors), not graph execution. This module
parses the protobuf wire format directly for:

  ModelProto.graph (field 7) -> GraphProto.initializer (field 5,
  repeated TensorProto) with TensorProto fields dims(1), data_type(2),
  float_data(4), int64_data(7), name(8), raw_data(9).

Covers fp32/fp16/bf16/int32/int64/uint8/bool tensors — everything the
target checkpoints contain.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16,
    11: np.float64, 12: np.uint32, 13: np.uint64,
    16: np.uint16,  # bfloat16 stored as raw uint16; caller reinterprets
}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over a protobuf message.
    value: int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype_code = 1
    name = ""
    raw = None
    floats: list[float] = []
    int64s: list[int] = []
    int32s: list[int] = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)
        elif field == 2 and wire == 0:
            dtype_code = val
        elif field == 4:  # float_data (packed or repeated)
            if wire == 2:
                floats.extend(
                    np.frombuffer(val, dtype="<f4").tolist()
                )
            else:
                floats.append(
                    np.frombuffer(
                        int(val).to_bytes(4, "little"), dtype="<f4"
                    )[0]
                )
        elif field == 5 and wire == 2:  # int32_data packed
            int32s.extend(np.frombuffer(val, dtype="<i4").tolist())
        elif field == 5 and wire == 0:
            int32s.append(val)
        elif field == 7 and wire == 2:  # int64_data packed
            int64s.extend(np.frombuffer(val, dtype="<i8").tolist())
        elif field == 7 and wire == 0:
            int64s.append(val)
        elif field == 8 and wire == 2:
            name = val.decode("utf-8", "replace")
        elif field == 9 and wire == 2:
            raw = val
    dtype = _DTYPES.get(dtype_code, np.float32)
    shape = tuple(dims)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif floats:
        arr = np.asarray(floats, dtype=np.float32)
    elif int64s:
        arr = np.asarray(int64s, dtype=np.int64)
    elif int32s:
        arr = np.asarray(int32s, dtype=np.int32)
    else:
        arr = np.zeros(shape, dtype=dtype)
    return name, arr.reshape(shape) if shape else arr


def read_onnx_initializers(path: str | Path) -> dict[str, np.ndarray]:
    """-> {initializer name: ndarray} from an .onnx file."""
    buf = Path(path).read_bytes()
    out: dict[str, np.ndarray] = {}
    for field, wire, val in _fields(buf):
        if field == 7 and wire == 2:  # ModelProto.graph
            for gfield, gwire, gval in _fields(val):
                if gfield == 5 and gwire == 2:  # initializer
                    name, arr = _parse_tensor(gval)
                    if name:
                        out[name] = arr
                elif gfield == 15 and gwire == 2:
                    # sparse_initializer unsupported; ignore
                    pass
    return out


def read_onnx_io_names(path: str | Path) -> tuple[list[str], list[str]]:
    """-> (graph input names, output names) — useful to sanity-check a
    checkpoint before conversion."""
    buf = Path(path).read_bytes()
    inputs: list[str] = []
    outputs: list[str] = []
    for field, wire, val in _fields(buf):
        if field == 7 and wire == 2:
            for gfield, gwire, gval in _fields(val):
                if gfield in (11, 12) and gwire == 2:  # input/output ValueInfo
                    for vfield, vwire, vval in _fields(gval):
                        if vfield == 1 and vwire == 2:
                            (inputs if gfield == 11 else outputs).append(
                                vval.decode("utf-8", "replace")
                            )
    return inputs, outputs
