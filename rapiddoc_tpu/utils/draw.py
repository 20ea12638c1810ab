"""Visual QA overlays: layout / span boxes drawn onto rendered pages.

Role parity with the reference (reference: rapid_doc/utils/draw_bbox.py —
*_layout.pdf / *_span.pdf debug artifacts). Emits a PDF built from
annotated page renders.
"""
from __future__ import annotations

from PIL import Image, ImageDraw, ImageFont

from ..types import BlockType

_TYPE_COLORS = {
    BlockType.TEXT: (30, 120, 255),
    BlockType.TITLE: (220, 40, 40),
    BlockType.IMAGE: (40, 170, 90),
    BlockType.IMAGE_BODY: (40, 170, 90),
    BlockType.IMAGE_CAPTION: (120, 200, 120),
    BlockType.TABLE: (200, 120, 30),
    BlockType.TABLE_BODY: (200, 120, 30),
    BlockType.TABLE_CAPTION: (230, 170, 90),
    BlockType.INTERLINE_EQUATION: (160, 60, 200),
    BlockType.LIST: (60, 60, 220),
    BlockType.INDEX: (90, 90, 180),
    BlockType.DISCARDED: (150, 150, 150),
}
_DEFAULT_COLOR = (90, 90, 90)


def draw_layout_on_page(
    page_img: Image.Image, page_info: dict, scale: float
) -> Image.Image:
    """Draw block boxes + reading-order indices on a rendered page."""
    img = page_img.convert("RGB").copy()
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 16
        )
    except OSError:
        font = ImageFont.load_default()

    def draw_block(block: dict, order: int | None) -> None:
        color = _TYPE_COLORS.get(block["type"], _DEFAULT_COLOR)
        x0, y0, x1, y1 = (v * scale for v in block["bbox"])
        draw.rectangle([x0, y0, x1, y1], outline=color, width=2)
        label = block["type"] + (f" #{order}" if order is not None else "")
        draw.text((x0 + 2, max(y0 - 18, 0)), label, fill=color, font=font)

    blocks = page_info.get("para_blocks") or page_info.get("preproc_blocks") or []
    for i, block in enumerate(blocks):
        draw_block(block, i)
        for sub in block.get("blocks", []):
            draw_block(sub, None)
    for block in page_info.get("discarded_blocks", []):
        draw_block(block, None)
    return img


# span colors keyed by span type (reference: draw_span_bbox
# draw_bbox_without_number color table, draw_bbox.py:510-520)
_SPAN_COLORS = {
    "text": (255, 0, 0),
    "inline_equation": (0, 200, 0),
    "interline_equation": (0, 0, 255),
    "checkbox": (0, 200, 0),
    "image": (255, 204, 0),
    "table": (204, 0, 255),
}
_DROPPED_COLOR = (158, 158, 158)


def _draw_box_or_polygon(draw, span: dict, scale: float, color, width=1):
    """Rotated content carries polygon_points alongside bbox (reference:
    cal_canvas_polygon/draw_polygon, draw_bbox.py:64-131)."""
    poly = span.get("polygon_points")
    if poly and len(poly) >= 3:
        pts = [(px * scale, py * scale) for px, py in poly]
        draw.polygon(pts, outline=color)
        return
    x0, y0, x1, y1 = (v * scale for v in span["bbox"])
    draw.rectangle([x0, y0, x1, y1], outline=color, width=width)


def draw_spans_on_page(
    page_img: Image.Image, page_info: dict, scale: float
) -> Image.Image:
    img = page_img.convert("RGB").copy()
    draw = ImageDraw.Draw(img)

    def walk(blocks, dropped=False):
        for block in blocks:
            if "blocks" in block:
                walk(block["blocks"], dropped)
            for line in block.get("lines", []):
                for span in line.get("spans", []):
                    color = (
                        _DROPPED_COLOR
                        if dropped
                        else _SPAN_COLORS.get(
                            span.get("type", "text"), (255, 80, 80)
                        )
                    )
                    _draw_box_or_polygon(draw, span, scale, color)

    walk(page_info.get("para_blocks") or page_info.get("preproc_blocks") or [])
    walk(page_info.get("discarded_blocks") or [], dropped=True)
    return img


def draw_line_sort_on_page(
    page_img: Image.Image, page_info: dict, scale: float
) -> Image.Image:
    """Line-level reading order overlay: every text line gets its global
    order index (reference: draw_line_sort_bbox, draw_bbox.py:552)."""
    img = page_img.convert("RGB").copy()
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 12
        )
    except OSError:
        font = ImageFont.load_default()
    blocks = page_info.get("preproc_blocks") or page_info.get(
        "para_blocks"
    ) or []

    def lines_of(block):
        if "blocks" in block and block["blocks"]:
            for sub in block["blocks"]:
                yield from sub.get("lines", [])
        else:
            yield from block.get("lines", [])

    # walk blocks in computed reading order (block['index'] from the sort
    # stage); lines carry their own 'index' when the pipeline stored one,
    # else they are numbered sequentially along that order (reference
    # draw_line_sort_bbox renders line['index'], draw_bbox.py:552)
    order = 0
    for block in sorted(
        range(len(blocks)), key=lambda i: blocks[i].get("index", i)
    ):
        for line in lines_of(blocks[block]):
            bbox = line.get("bbox")
            if not bbox:
                continue
            idx = line.get("index")
            if idx is None:
                idx = order
            x0, y0, x1, y1 = (v * scale for v in bbox)
            draw.rectangle([x0, y0, x1, y1], outline=(255, 0, 0), width=1)
            draw.text((x0 + 1, y0), str(idx), fill=(255, 0, 0), font=font)
            order += 1
    return img


def debug_pdfs_from_output(
    pdf_bytes: bytes,
    middle_json: dict,
    *,
    layout: bool = True,
    spans: bool = False,
    line_sort: bool = False,
    dpi: int = 96,
) -> dict[str, bytes]:
    """Re-render the source pages and emit annotated debug PDFs
    (reference: cli/common.py:188-194 — *_layout.pdf / *_span.pdf /
    *_line_sort.pdf visual QA artifacts). Returns a dict with any of
    "layout" / "span" / "line_sort" keys."""
    from .. import pdfio

    pdf_info = (middle_json or {}).get("pdf_info") or []
    if not pdf_info or not (layout or spans or line_sort):
        return {}
    doc = pdfio.open_pdf(pdf_bytes)
    n = min(len(doc), len(pdf_info))
    imgs = [pdfio.render_page(doc.get_page(i), dpi=dpi) for i in range(n)]
    scale = dpi / 72.0
    out: dict[str, bytes] = {}
    if layout:
        out["layout"] = render_debug_pdf(imgs, pdf_info[:n], scale, "layout")
    if spans:
        out["span"] = render_debug_pdf(
            [im.copy() for im in imgs], pdf_info[:n], scale, "span"
        )
    if line_sort:
        out["line_sort"] = render_debug_pdf(
            [im.copy() for im in imgs], pdf_info[:n], scale, "line_sort"
        )
    return out


def render_debug_pdf(
    page_imgs: list[Image.Image],
    pdf_info: list[dict],
    scale: float,
    mode: str = "layout",
) -> bytes:
    """Annotated pages -> a PDF for visual QA."""
    from ..pdfio.writer import images_to_pdf

    fn = {
        "layout": draw_layout_on_page,
        "span": draw_spans_on_page,
        "line_sort": draw_line_sort_on_page,
    }[mode]
    annotated = [
        fn(img, info, scale) for img, info in zip(page_imgs, pdf_info)
    ]
    return images_to_pdf(annotated, dpi=int(72 * scale))
