"""Decode PDF image XObjects into PIL images.

Codecs: DCTDecode (JPEG via PIL), JPXDecode (JPEG2000 via PIL), CCITTFaxDecode
(wrapped in a minimal TIFF container for libtiff), and raw samples behind
Flate/LZW (Gray/RGB/CMYK/Indexed/1-bit). SMask/Mask alpha is applied.
"""
from __future__ import annotations

import io
import struct
from typing import Any

import numpy as np
from PIL import Image

from ..utils.logging import get_logger
from .cos import Stream
from .filters import decode_stream, image_codec

logger = get_logger("rapiddoc_tpu.pdfio.images")


def _ccitt_to_tiff(data: bytes, width: int, height: int, params: dict) -> bytes:
    """Wrap raw CCITT G3/G4 data in a single-strip TIFF header."""
    k = int(params.get("K", 0) or 0)
    if k < 0:
        compression = 4  # G4
    elif k == 0:
        compression = 3  # G3 1-D
    else:
        compression = 3  # G3 2-D
    black_is_1 = bool(params.get("BlackIs1", False))
    photometric = 1 if black_is_1 else 0  # 0: WhiteIsZero (min is white)

    fields = [
        (256, 4, 1, width),        # ImageWidth
        (257, 4, 1, height),       # ImageLength
        (258, 3, 1, 1),            # BitsPerSample
        (259, 3, 1, compression),  # Compression
        (262, 3, 1, photometric),  # Photometric
        (273, 4, 1, 0),            # StripOffsets (patched below)
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 4, 1, height),       # RowsPerStrip
        (279, 4, 1, len(data)),    # StripByteCounts
    ]
    if compression == 3 and k > 0:
        fields.append((292, 4, 1, 1))  # T4Options: 2-D encoding
    fields.sort()
    n = len(fields)
    ifd_offset = 8
    header = struct.pack("<2sHI", b"II", 42, ifd_offset)
    ifd = struct.pack("<H", n)
    data_offset = 8 + 2 + n * 12 + 4
    out_fields = b""
    for tag, ftype, count, value in fields:
        if tag == 273:
            value = data_offset
        out_fields += struct.pack("<HHII", tag, ftype, count, value)
    ifd += out_fields + struct.pack("<I", 0)
    return header + ifd + data


def _apply_decode_array(arr: np.ndarray, decode: list, bpc: int) -> np.ndarray:
    """Apply a /Decode remap to integer samples."""
    if not decode:
        return arr
    maxval = (1 << bpc) - 1
    out = arr.astype(np.float32)
    ncomp = 1 if arr.ndim == 2 else arr.shape[2]
    for c in range(ncomp):
        lo, hi = float(decode[2 * c]), float(decode[2 * c + 1])
        comp = out[..., c] if arr.ndim == 3 else out
        comp = lo + comp * (hi - lo) / maxval
        comp = comp * maxval
        if arr.ndim == 3:
            out[..., c] = comp
        else:
            out = comp
    return np.clip(out, 0, maxval).astype(arr.dtype)


def _unpack_bits(data: bytes, width: int, height: int, ncomp: int, bpc: int) -> np.ndarray:
    row_bytes = (width * ncomp * bpc + 7) // 8
    need = row_bytes * height
    if len(data) < need:
        data = data + b"\x00" * (need - len(data))
    buf = np.frombuffer(data[:need], dtype=np.uint8).reshape(height, row_bytes)
    if bpc == 8:
        arr = buf[:, : width * ncomp]
    elif bpc == 1:
        arr = np.unpackbits(buf, axis=1)[:, : width * ncomp]
    elif bpc == 4:
        hi = buf >> 4
        lo = buf & 0x0F
        arr = np.empty((height, row_bytes * 2), dtype=np.uint8)
        arr[:, 0::2] = hi
        arr[:, 1::2] = lo
        arr = arr[:, : width * ncomp]
    elif bpc == 16:
        arr16 = buf.view(">u2")[:, : width * ncomp]
        arr = (arr16 >> 8).astype(np.uint8)
    else:
        arr = buf[:, : width * ncomp]
    if ncomp > 1:
        arr = arr.reshape(height, width, ncomp)
    else:
        arr = arr.reshape(height, width)
    return arr


def _colorspace_info(doc, cs: Any) -> tuple[str, int, Any]:
    """Returns (family, ncomponents, extra) where extra is the palette for
    Indexed spaces."""
    cs = doc.resolve(cs)
    if cs is None:
        return ("DeviceGray", 1, None)
    if isinstance(cs, str):
        name = str(cs)
        if name in ("DeviceRGB", "CalRGB"):
            return ("DeviceRGB", 3, None)
        if name in ("DeviceCMYK",):
            return ("DeviceCMYK", 4, None)
        return ("DeviceGray", 1, None)
    if isinstance(cs, list) and cs:
        family = str(doc.resolve(cs[0]))
        if family == "ICCBased":
            stream = doc.resolve(cs[1]) if len(cs) > 1 else None
            n = 3
            if isinstance(stream, Stream):
                n = int(doc.resolve(stream.dict.get("N", 3)) or 3)
            return (
                {1: "DeviceGray", 3: "DeviceRGB", 4: "DeviceCMYK"}.get(n, "DeviceRGB"),
                n,
                None,
            )
        if family == "Indexed":
            base_family, base_n, _ = _colorspace_info(doc, cs[1])
            lookup = doc.resolve(cs[3]) if len(cs) > 3 else b""
            if isinstance(lookup, Stream):
                lookup = doc.stream_bytes(lookup)
            return ("Indexed", 1, (base_family, base_n, bytes(lookup or b"")))
        if family in ("CalRGB", "Lab"):
            return ("DeviceRGB", 3, None)
        if family == "CalGray":
            return ("DeviceGray", 1, None)
        if family in ("Separation", "DeviceN"):
            n = 1
            if family == "DeviceN" and len(cs) > 1:
                names = doc.resolve(cs[1])
                n = len(names) if isinstance(names, list) else 1
            return ("Separation", n, None)
    return ("DeviceGray", 1, None)


def _cmyk_to_rgb(arr: np.ndarray) -> np.ndarray:
    c, m, y, k = [arr[..., i].astype(np.float32) / 255.0 for i in range(4)]
    r = (1 - c) * (1 - k)
    g = (1 - m) * (1 - k)
    b = (1 - y) * (1 - k)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def xobject_to_pil(doc, stream: Stream) -> Image.Image | None:
    """Decode an image XObject (or inline image) to RGB/RGBA/L PIL image."""
    d = stream.dict
    r = doc.resolve
    width = int(r(d.get("Width", 0)) or 0)
    height = int(r(d.get("Height", 0)) or 0)
    if width <= 0 or height <= 0:
        return None
    codec = image_codec(d, r)
    img: Image.Image | None = None

    if codec in ("DCTDecode", "DCT"):
        payload = decode_stream(stream, r)
        try:
            img = Image.open(io.BytesIO(payload))
            img.load()
            if img.mode == "CMYK":
                # Adobe JPEGs are often stored inverted
                arr = np.array(img)
                img = Image.fromarray(_cmyk_to_rgb(255 - arr))
            else:
                img = img.convert("RGB") if img.mode not in ("L", "RGB") else img
        except Exception:
            return None
    elif codec == "JPXDecode":
        payload = decode_stream(stream, r)
        try:
            img = Image.open(io.BytesIO(payload))
            img.load()
        except Exception:
            return None
    elif codec in ("CCITTFaxDecode", "CCF"):
        payload = decode_stream(stream, r)
        parms = r(d.get("DecodeParms") or d.get("DP")) or {}
        if isinstance(parms, list):
            parms = next(
                (r(p) for p in parms if isinstance(r(p), dict) and "K" in r(p)),
                {},
            ) or {}
        parms = {k: r(v) for k, v in parms.items()} if isinstance(parms, dict) else {}
        parms.setdefault("Columns", width)
        tiff = _ccitt_to_tiff(payload, int(parms.get("Columns", width)), height, parms)
        try:
            img = Image.open(io.BytesIO(tiff))
            img.load()
            img = img.convert("L")
        except Exception:
            return None
    elif codec == "JBIG2Decode":
        payload = decode_stream(stream, r)
        parms = r(d.get("DecodeParms") or d.get("DP")) or {}
        if isinstance(parms, list):
            parms = next(
                (
                    r(p)
                    for p in parms
                    if isinstance(r(p), dict) and "JBIG2Globals" in r(p)
                ),
                {},
            ) or {}
        glob = None
        gs = r(parms.get("JBIG2Globals")) if isinstance(parms, dict) else None
        if gs is not None:
            try:
                glob = decode_stream(gs, r)
            except Exception:
                glob = None
        try:
            from .jbig2 import decode as jbig2_decode

            bitmap = jbig2_decode(payload, glob, width, height)
        except Exception as e:
            logger.warning("JBIG2 decode failed (%s); placeholder", e)
            return None
        # JBIG2 1 = black; PDF renders as DeviceGray where black = 0
        img = Image.fromarray(((1 - bitmap) * 255).astype(np.uint8), "L")
    else:
        # raw samples behind zero or more non-image filters
        data = decode_stream(stream, r)
        bpc = int(r(d.get("BitsPerComponent", 8)) or 8)
        if bool(r(d.get("ImageMask", False))):
            arr = _unpack_bits(data, width, height, 1, 1)
            decode = r(d.get("Decode"))
            # ImageMask: sample==0 paints by default; Decode [1 0] flips
            if isinstance(decode, list) and float(r(decode[0])) == 1.0:
                arr = 1 - arr
            mask = ((1 - arr) * 255).astype(np.uint8)  # 255 where painted
            return Image.fromarray(mask, mode="L").convert("LA")
        family, ncomp, extra = _colorspace_info(doc, d.get("ColorSpace") or d.get("CS"))
        arr = _unpack_bits(data, width, height, ncomp, bpc)
        decode = r(d.get("Decode") or d.get("D"))
        if isinstance(decode, list):
            decode = [float(r(v)) for v in decode]
            arr = _apply_decode_array(arr, decode, bpc if bpc <= 8 else 8)
        if family == "Indexed":
            base_family, base_n, lookup = extra
            pal = np.frombuffer(lookup, dtype=np.uint8)
            entries = len(pal) // base_n if base_n else 0
            if entries == 0:
                return None
            pal = pal[: entries * base_n].reshape(entries, base_n)
            idx = np.clip(arr, 0, entries - 1)
            out = pal[idx]
            if base_family == "DeviceCMYK":
                out = _cmyk_to_rgb(out)
            elif base_n == 1:
                out = out[..., 0]
            img = Image.fromarray(out)
        elif family == "DeviceCMYK":
            if bpc < 8:
                arr = (arr.astype(np.float32) * (255.0 / ((1 << bpc) - 1))).astype(np.uint8)
            img = Image.fromarray(_cmyk_to_rgb(arr))
        elif ncomp == 3:
            if bpc < 8:
                arr = (arr.astype(np.float32) * (255.0 / ((1 << bpc) - 1))).astype(np.uint8)
            img = Image.fromarray(arr, mode="RGB")
        else:
            if arr.ndim == 3:
                arr = arr[..., 0]
            if bpc < 8:
                arr = (arr.astype(np.float32) * (255.0 / ((1 << bpc) - 1))).astype(np.uint8)
            if family == "Separation":
                arr = 255 - arr  # ink amount -> luminance
            img = Image.fromarray(arr.astype(np.uint8), mode="L")

    if img is None:
        return None

    # Soft mask (alpha)
    smask = r(d.get("SMask"))
    if isinstance(smask, Stream):
        alpha_img = xobject_to_pil(doc, smask)
        if alpha_img is not None:
            alpha = alpha_img.convert("L").resize(img.size)
            img = img.convert("RGBA")
            img.putalpha(alpha)
    return img
