"""Content-based file-type identification.

Role parity with the reference's vendored Magika (reference:
rapid_doc/model/magika/magika.py — deep-learning filetype id behind
utils/guess_suffix_or_lang.py:174-193 guess_suffix_by_bytes). The trained
magika .onnx runs through the JAX ONNX interpreter (engine/onnx_jax.py);
when the model asset is unavailable the magic-bytes sniffer keeps the
pipeline functional.

Feature extraction per reference magika.py:404-503 — at most `block_size`
bytes from each end, whitespace-stripped, `beg` padded at the end and
`end` padded at the front with `padding_token`.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from pathlib import Path

import numpy as np

from .logging import get_logger

logger = get_logger("rapiddoc_tpu.sniff")

_BEG = 1024
_END = 1024
_BLOCK = 4096
_PAD = 256

_VENDORED_MODEL_DIR = (
    Path(__file__).resolve().parent.parent / "assets" / "magika"
)


def _model_dir() -> Path | None:
    env = os.environ.get("RAPIDDOC_MAGIKA_DIR")
    if env and Path(env).is_dir():
        return Path(env)
    from ..config import get_models_dir

    local = get_models_dir() / "magika"
    if (local / "model.onnx").is_file():
        return local
    # vendored trained magika checkpoint (Apache-2.0 upstream artifact)
    if (_VENDORED_MODEL_DIR / "model.onnx").is_file():
        return _VENDORED_MODEL_DIR
    return None


@lru_cache(maxsize=1)
def _load_model():
    d = _model_dir()
    if d is None:
        return None
    try:
        from ..engine.onnx_jax import OnnxJaxFunction

        fn = OnnxJaxFunction.from_file(d / "model.onnx")
        cfg = json.loads((d / "config.min.json").read_text())
        return fn, cfg["target_labels_space"], cfg.get("overwrite_map", {})
    except Exception:
        logger.exception("magika model load failed; using magic bytes")
        return None


def magika_features(data: bytes) -> np.ndarray:
    beg = list(data[:_BLOCK].lstrip()[:_BEG])
    beg += [_PAD] * (_BEG - len(beg))
    end = list(data[-_BLOCK:].rstrip()[-_END:])
    end = [_PAD] * (_END - len(end)) + end
    return np.asarray([beg + end], np.int32)


def magika_classify(data: bytes) -> tuple[str, float]:
    """-> (label, confidence); ('unknown', 0.0) when the model is absent."""
    loaded = _load_model()
    if loaded is None or len(data) < 8:
        return "unknown", 0.0
    fn, labels, overwrite = loaded
    scores = fn(magika_features(data))[0][0]
    idx = int(np.argmax(scores))
    label = labels[idx]
    return overwrite.get(label, label), float(scores[idx])


_MAGIC_SUFFIX = {
    b"%PDF": "pdf",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "webp",
    b"\xff\xd8\xff": "jpeg",
    b"PK\x03\x04": "zip",
}

# magika label -> canonical suffix the pipeline routes on
_LABEL_SUFFIX = {
    "pdf": "pdf", "png": "png", "jpeg": "jpg", "gif": "gif", "webp": "webp",
    "bmp": "bmp", "tiff": "tif", "docx": "docx", "pptx": "pptx",
    "xlsx": "xlsx", "doc": "doc", "ppt": "ppt", "xls": "xls", "zip": "zip",
    "html": "html", "markdown": "md", "txt": "txt", "csv": "csv",
}


def guess_suffix_by_bytes(data: bytes) -> str:
    """Best-effort suffix: trained magika when available, magic bytes
    otherwise (reference: utils/guess_suffix_or_lang.py:174-193)."""
    label, score = magika_classify(data)
    if score >= 0.5 and label in _LABEL_SUFFIX:
        suffix = _LABEL_SUFFIX[label]
        if suffix == "zip":
            suffix = _office_zip_kind(data) or "zip"
        return suffix
    for magic, suffix in _MAGIC_SUFFIX.items():
        if data[: len(magic)] == magic:
            if suffix == "zip":
                return _office_zip_kind(data) or "zip"
            return suffix
    return ""


def _office_zip_kind(data: bytes) -> str | None:
    head = data[:4096]
    if b"word/" in head:
        return "docx"
    if b"ppt/" in head:
        return "pptx"
    if b"xl/" in head:
        return "xlsx"
    return None
