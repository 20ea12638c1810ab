"""Image cropping/saving helpers for pipeline outputs.

Counterpart of the reference's cut_image machinery
(reference: rapid_doc/utils/cut_image.py + pdf_image_tools.py crops).
"""
from __future__ import annotations

import hashlib
import io

import numpy as np
from PIL import Image


def crop_bbox(page_img: Image.Image, bbox, scale: float, pad: int = 0) -> Image.Image:
    """Crop a page-coordinate bbox from a rendered page image."""
    x0, y0, x1, y1 = (v * scale for v in bbox)
    x0, y0 = max(0, int(x0) - pad), max(0, int(y0) - pad)
    x1 = min(page_img.width, int(x1 + 0.999) + pad)
    y1 = min(page_img.height, int(y1 + 0.999) + pad)
    if x1 <= x0 or y1 <= y0:
        return Image.new("RGB", (1, 1), "white")
    return page_img.crop((x0, y0, x1, y1))


def image_digest_name(img: Image.Image, suffix: str = "jpg") -> str:
    arr = np.asarray(img.convert("RGB"))
    h = hashlib.sha256(arr.tobytes()).hexdigest()[:32]
    return f"{h}.{suffix}"


def encode_image(img: Image.Image, fmt: str = "JPEG", quality: int = 90) -> bytes:
    buf = io.BytesIO()
    img.convert("RGB").save(buf, format=fmt, quality=quality)
    return buf.getvalue()


def cut_span_images(
    page_info: dict,
    page_img: Image.Image,
    scale: float,
    image_writer,
    image_dir: str = "",
    originals: list[tuple[list[float], Image.Image]] | None = None,
    original_iou_thresh: float = 0.9,
) -> None:
    """Crop & save image/table/interline-equation span images, setting
    span['image_path'] in place. image_writer: DataWriter-like with write().

    `originals` ((bbox in page units, decoded PIL) pairs) enables the
    reference's extract_original_image behavior (reference:
    docs/analyze_param.md image_config — image spans matching an embedded
    image with IoU >= thresh keep the ORIGINAL pixels, not a screenshot
    crop)."""
    from ..types import ContentType
    from . import boxes as B

    def handle_span(span: dict) -> None:
        if (
            span.get("type") == ContentType.TABLE
            and span.get("html")
            and span.get("fill_images")
        ):
            # in-table image uuid placeholders -> saved crops + <img> tags
            # (reference: pdf_image_tools.save_table_fill_image :355-393)
            html = span["html"]
            for fill in span["fill_images"]:
                uid = fill.get("uuid")
                if not uid or uid not in html:
                    continue
                crop = crop_bbox(page_img, fill["bbox"], scale)
                name = image_digest_name(crop)
                if image_writer is not None:
                    image_writer.write(name, encode_image(crop))
                src = f"{image_dir or 'images'}/{name}"
                html = html.replace(uid, f'<img src="{src}" alt="Image" />')
            span["html"] = html
        if span.get("type") in (
            ContentType.IMAGE,
            ContentType.TABLE,
            ContentType.INTERLINE_EQUATION,
        ) and not span.get("image_path"):
            crop = None
            if originals and span["type"] == ContentType.IMAGE:
                for obox, oimg in originals:
                    if B.iou(span["bbox"], obox) >= original_iou_thresh:
                        crop = oimg
                        break
            if crop is None:
                crop = crop_bbox(page_img, span["bbox"], scale)
            name = image_digest_name(crop)
            if image_writer is not None:
                image_writer.write(name, encode_image(crop))
            span["image_path"] = name

    def walk_blocks(blocks: list[dict]) -> None:
        for block in blocks:
            if "blocks" in block:
                walk_blocks(block["blocks"])
            for line in block.get("lines", []):
                for span in line.get("spans", []):
                    handle_span(span)
            for span in block.get("spans", []):
                handle_span(span)

    walk_blocks(page_info.get("preproc_blocks", []))
