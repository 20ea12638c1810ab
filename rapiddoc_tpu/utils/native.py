"""ctypes bridge to the native host-ops library (native/hostops.cpp).

Auto-builds with g++ on first use when the shared object is missing;
callers fall back to pure-Python/numpy implementations when unavailable.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .logging import get_logger

logger = get_logger("rapiddoc_tpu.native")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libhostops.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    cpp = _NATIVE_DIR / "hostops.cpp"
    stale = (
        _SO.is_file()
        and cpp.is_file()
        and cpp.stat().st_mtime > _SO.stat().st_mtime
    )
    if (not _SO.is_file() or stale) and cpp.is_file():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError) as e:
            if not _SO.is_file():
                logger.info(
                    "native build unavailable (%s); using python paths", e
                )
                return None
    if not _SO.is_file():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.png_defilter.restype = ctypes.c_int
    lib.png_defilter.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.tiff_defilter.restype = None
    lib.tiff_defilter.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.iou_matrix.restype = None
    lib.iou_matrix.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.nms.restype = ctypes.c_int
    lib.nms.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
        ctypes.c_void_p,
    ]
    try:
        lib.levenshtein_u32.restype = ctypes.c_int64
        lib.levenshtein_u32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
    except AttributeError:  # stale .so without the symbol
        pass
    try:
        lib.jbig2_mq_new.restype = ctypes.c_void_p
        lib.jbig2_mq_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.jbig2_mq_free.argtypes = [ctypes.c_void_p]
        lib.jbig2_mq_decode_bit.restype = ctypes.c_int
        lib.jbig2_mq_decode_bit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.jbig2_decode_int.restype = ctypes.c_int
        lib.jbig2_decode_int.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.jbig2_decode_iaid.restype = ctypes.c_int
        lib.jbig2_decode_iaid.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.jbig2_generic_decode.restype = None
        lib.jbig2_generic_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.jbig2_refine_decode.restype = ctypes.c_int
        lib.jbig2_refine_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int,
        ]
    except AttributeError:  # stale .so without the jbig2 symbols
        pass
    _lib = lib
    return _lib


def lib() -> ctypes.CDLL | None:
    """The raw CDLL for callers with their own wrappers (pdfio.jbig2)."""
    return _load()


def available() -> bool:
    return _load() is not None


def png_defilter(data: bytes, row_len: int, bpp: int) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    nrows = len(data) // (row_len + 1)
    out = np.empty(nrows * row_len, dtype=np.uint8)
    lib.png_defilter(
        data, len(data), row_len, bpp, out.ctypes.data_as(ctypes.c_void_p)
    )
    return out.tobytes()


def tiff_defilter(data: bytes, row_len: int, bpp: int) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(data, dtype=np.uint8).copy()
    lib.tiff_defilter(
        arr.ctypes.data_as(ctypes.c_void_p), len(arr), row_len, bpp
    )
    return arr.tobytes()


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.float64).reshape(-1, 4)
    b = np.ascontiguousarray(b, dtype=np.float64).reshape(-1, 4)
    out = np.empty((len(a), len(b)), dtype=np.float64)
    lib.iou_matrix(
        a.ctypes.data_as(ctypes.c_void_p), len(a),
        b.ctypes.data_as(ctypes.c_void_p), len(b),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> list[int] | None:
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, dtype=np.float64).reshape(-1, 4)
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    keep = np.empty(len(boxes), dtype=np.int32)
    n = lib.nms(
        boxes.ctypes.data_as(ctypes.c_void_p),
        scores.ctypes.data_as(ctypes.c_void_p),
        len(boxes), iou_threshold,
        keep.ctypes.data_as(ctypes.c_void_p),
    )
    return keep[:n].tolist()


def levenshtein(a: str, b: str) -> int | None:
    """Edit distance via the native kernel; None -> caller's python path."""
    lib = _load()
    if lib is None or not hasattr(lib, "levenshtein_u32"):
        return None
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    return int(
        lib.levenshtein_u32(
            aa.ctypes.data if len(aa) else None, len(aa),
            bb.ctypes.data if len(bb) else None, len(bb),
        )
    )
