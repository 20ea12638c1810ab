"""Shared office-conversion infrastructure."""
from __future__ import annotations

import html as html_mod
from dataclasses import dataclass, field

from ..types import BlockType, ContentType, MakeMode
from ..version import __version__

NS = {
    "w": "http://schemas.openxmlformats.org/wordprocessingml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "a": "http://schemas.openxmlformats.org/drawingml/2006/main",
    "p": "http://schemas.openxmlformats.org/presentationml/2006/main",
    "m": "http://schemas.openxmlformats.org/officeDocument/2006/math",
    "rel": "http://schemas.openxmlformats.org/package/2006/relationships",
    "wp": "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing",
    "pic": "http://schemas.openxmlformats.org/drawingml/2006/picture",
    "s": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
}


def q(tag: str) -> str:
    """'w:p' -> '{ns}p'."""
    prefix, local = tag.split(":")
    return f"{{{NS[prefix]}}}{local}"


@dataclass
class OfficeBlock:
    type: str  # text | title | table | image | equation | code
    text: str = ""
    html: str = ""
    image_name: str = ""
    level: int = 1
    page_idx: int = 0


@dataclass
class OfficeResult:
    blocks: list[OfficeBlock] = field(default_factory=list)
    images: dict[str, bytes] = field(default_factory=dict)
    n_pages: int = 1

    def add_text(self, text: str, page: int = 0) -> None:
        if text and text.strip():
            self.blocks.append(OfficeBlock("text", text=text.strip(), page_idx=page))

    def add_title(self, text: str, level: int = 1, page: int = 0) -> None:
        if text and text.strip():
            self.blocks.append(
                OfficeBlock("title", text=text.strip(), level=level, page_idx=page)
            )

    def add_table(self, html: str, page: int = 0) -> None:
        if html:
            self.blocks.append(OfficeBlock("table", html=html, page_idx=page))

    def add_image(self, name: str, data: bytes, page: int = 0) -> None:
        self.images[f"images/{name}"] = data
        self.blocks.append(OfficeBlock("image", image_name=f"images/{name}", page_idx=page))

    def add_equation(self, latex: str, page: int = 0) -> None:
        if latex and latex.strip():
            self.blocks.append(OfficeBlock("equation", text=latex.strip(), page_idx=page))

    # ------------------------------------------------------------- outputs

    def to_markdown(self) -> str:
        out = []
        for b in self.blocks:
            if b.type == "title":
                out.append(f"{'#' * min(b.level, 4)} {b.text}")
            elif b.type == "text":
                out.append(b.text)
            elif b.type == "table":
                out.append(b.html)
            elif b.type == "image":
                out.append(f"![]({b.image_name})")
            elif b.type == "equation":
                out.append(f"$$\n{b.text}\n$$")
        return "\n\n".join(out)

    def to_content_list(self) -> list[dict]:
        items = []
        caption_for: dict[int, tuple[str, int]] = {}
        # caption-pattern text adjacent to an image/table attaches to it
        # (reference: backend/office/office_magic_model.py caption
        # classification + two-layer body/caption grouping)
        for i, b in enumerate(self.blocks):
            if b.type != "text" or not _CAPTION_RE.match(b.text.strip()):
                continue
            for j in (i - 1, i + 1):
                if 0 <= j < len(self.blocks) and self.blocks[j].type in (
                    "image", "table"
                ) and self.blocks[j].page_idx == b.page_idx:
                    caption_for[i] = (
                        "img_caption"
                        if self.blocks[j].type == "image"
                        else "table_caption",
                        j,
                    )
                    break
        pending: dict[int, list[tuple[str, str]]] = {}
        for i, (key, j) in caption_for.items():
            pending.setdefault(j, []).append((key, self.blocks[i].text))
        for i, b in enumerate(self.blocks):
            if i in caption_for:
                continue
            if b.type == "title":
                items.append(
                    {"type": ContentType.TEXT, "text": b.text, "text_level": b.level,
                     "page_idx": b.page_idx}
                )
            elif b.type == "text":
                items.append({"type": ContentType.TEXT, "text": b.text,
                              "page_idx": b.page_idx})
            elif b.type == "table":
                item = {"type": ContentType.TABLE, "table_body": b.html,
                        "page_idx": b.page_idx}
                for key, text in pending.get(i, []):
                    item.setdefault(key, []).append(text)
                items.append(item)
            elif b.type == "image":
                item = {"type": ContentType.IMAGE, "img_path": b.image_name,
                        "page_idx": b.page_idx}
                for key, text in pending.get(i, []):
                    item.setdefault(key, []).append(text)
                items.append(item)
            elif b.type == "equation":
                items.append({"type": ContentType.EQUATION, "text": b.text,
                              "text_format": "latex", "page_idx": b.page_idx})
        return items

    def to_middle_json(self) -> dict:
        pages: dict[int, list] = {}
        for b in self.blocks:
            pages.setdefault(b.page_idx, []).append(b)
        pdf_info = []
        for page_idx in sorted(pages) if pages else [0]:
            blocks_json = []
            y = 0.0
            for b in pages.get(page_idx, []):
                bbox = [0.0, y, 600.0, y + 20.0]
                y += 24.0
                if b.type in ("text", "title"):
                    blocks_json.append(
                        {
                            "type": BlockType.TITLE if b.type == "title" else BlockType.TEXT,
                            "bbox": bbox,
                            **({"level": b.level} if b.type == "title" else {}),
                            "lines": [
                                {
                                    "bbox": bbox,
                                    "spans": [
                                        {"bbox": bbox, "type": ContentType.TEXT,
                                         "content": b.text}
                                    ],
                                }
                            ],
                        }
                    )
                elif b.type == "table":
                    blocks_json.append(
                        {
                            "type": BlockType.TABLE,
                            "bbox": bbox,
                            "blocks": [
                                {
                                    "type": BlockType.TABLE_BODY,
                                    "bbox": bbox,
                                    "lines": [
                                        {
                                            "bbox": bbox,
                                            "spans": [
                                                {"bbox": bbox,
                                                 "type": ContentType.TABLE,
                                                 "html": b.html}
                                            ],
                                        }
                                    ],
                                }
                            ],
                        }
                    )
                elif b.type == "image":
                    blocks_json.append(
                        {
                            "type": BlockType.IMAGE,
                            "bbox": bbox,
                            "blocks": [
                                {
                                    "type": BlockType.IMAGE_BODY,
                                    "bbox": bbox,
                                    "lines": [
                                        {
                                            "bbox": bbox,
                                            "spans": [
                                                {"bbox": bbox,
                                                 "type": ContentType.IMAGE,
                                                 "image_path": b.image_name.split("/")[-1]}
                                            ],
                                        }
                                    ],
                                }
                            ],
                        }
                    )
                elif b.type == "equation":
                    blocks_json.append(
                        {
                            "type": BlockType.INTERLINE_EQUATION,
                            "bbox": bbox,
                            "lines": [
                                {
                                    "bbox": bbox,
                                    "spans": [
                                        {"bbox": bbox,
                                         "type": ContentType.INTERLINE_EQUATION,
                                         "content": b.text}
                                    ],
                                }
                            ],
                        }
                    )
            pdf_info.append(
                {
                    "preproc_blocks": blocks_json,
                    "para_blocks": blocks_json,
                    "page_idx": page_idx,
                    "page_size": [600.0, max(y, 800.0)],
                    "discarded_blocks": [],
                }
            )
        return {
            "pdf_info": pdf_info,
            "_backend": "office",
            "_version_name": __version__,
        }


_CAPTION_RE = __import__("re").compile(
    r"^(图|表|圖|Figure|Fig\.?|Table|Chart|Diagram)\s*\d", __import__("re").I
)


def esc(text: str) -> str:
    return html_mod.escape(text, quote=False)
