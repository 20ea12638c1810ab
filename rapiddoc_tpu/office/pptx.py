"""PPTX -> blocks converter.

Behavioral counterpart of the reference pptx converter
(reference: rapid_doc/model/pptx/pptx_converter.py + xycut_pp_sorter.py):
slides in order; shapes sorted top-left-ish (XY-cut-lite on shape offsets);
titles, body text, tables, images.
"""
from __future__ import annotations

import io
import os
import re
import zipfile
from xml.etree import ElementTree as ET

from .common import NS, OfficeResult, esc, q
from .docx import _load_rels

A = NS["a"]
P = NS["p"]


def _shape_xy(sp) -> tuple[int, int]:
    xfrm = sp.find(f".//{{{A}}}xfrm")
    if xfrm is not None:
        off = xfrm.find(f"{{{A}}}off")
        if off is not None:
            try:
                return int(off.get("y", "0")), int(off.get("x", "0"))
            except ValueError:
                pass
    return (1 << 60), (1 << 60)


def _shape_text(sp) -> list[str]:
    """Paragraph texts of a shape."""
    out = []
    txbody = sp.find(f"{{{P}}}txBody")
    if txbody is None:
        txbody = sp.find(f"{{{A}}}txBody")
    if txbody is None:
        return out
    for para in txbody.findall(f"{{{A}}}p"):
        parts = []
        for r in para.iter(f"{{{A}}}r"):
            t = r.find(f"{{{A}}}t")
            if t is not None and t.text:
                parts.append(t.text)
        text = "".join(parts).strip()
        if text:
            out.append(text)
    return out


def _is_title(sp) -> bool:
    ph = sp.find(f".//{{{P}}}ph")
    return ph is not None and (ph.get("type") in ("title", "ctrTitle"))


def _table_to_html(tbl) -> str:
    rows = []
    for tr in tbl.findall(f"{{{A}}}tr"):
        cells = []
        for tc in tr.findall(f"{{{A}}}tc"):
            if tc.get("hMerge") == "1" or tc.get("vMerge") == "1":
                continue
            attrs = ""
            span = tc.get("gridSpan")
            if span and span != "1":
                attrs += f' colspan="{span}"'
            rowspan = tc.get("rowSpan")
            if rowspan and rowspan != "1":
                attrs += f' rowspan="{rowspan}"'
            text = "\n".join(_shape_text(tc) or [""]) or "\n".join(
                t.text or "" for t in tc.iter(f"{{{A}}}t")
            )
            cells.append(f"<td{attrs}>{esc(text.strip())}</td>")
        rows.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows) + "</table>"


def _shape_wh(sp) -> tuple[int, int]:
    xfrm = sp.find(f".//{{{A}}}xfrm")
    if xfrm is not None:
        ext = xfrm.find(f"{{{A}}}ext")
        if ext is not None:
            try:
                return int(ext.get("cx", "0")), int(ext.get("cy", "0"))
            except ValueError:
                pass
    return 0, 0


def _sort_shapes(items: list[tuple]) -> list[tuple]:
    """Reading order for slide shapes via XY-cut over their boxes
    (reference: rapid_doc/model/pptx/xycut_pp_sorter.py); items are
    (y, x, w, h, kind, payload) falling back to (y, x) sort when any
    extent is unknown."""
    if len(items) < 2 or any(it[2] <= 0 or it[3] <= 0 for it in items):
        return sorted(items, key=lambda it: (it[0], it[1]))
    from ..reading_order.xycut import sort_boxes_reading_order

    boxes = [[it[1], it[0], it[1] + it[2], it[0] + it[3]] for it in items]
    order = sort_boxes_reading_order(boxes)
    return [items[i] for i in order]


def pptx_to_blocks(data: bytes) -> OfficeResult:
    result = OfficeResult()
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        # slide order from presentation.xml + its rels
        slides: list[str] = []
        if "ppt/presentation.xml" in z.namelist():
            pres_rels = _load_rels(z, "ppt/presentation.xml")
            root = ET.fromstring(z.read("ppt/presentation.xml"))
            for sld in root.iter(f"{{{P}}}sldId"):
                rid = sld.get(q("r:id"))
                target = pres_rels.get(rid)
                if target and target in z.namelist():
                    slides.append(target)
        if not slides:
            slides = sorted(
                (n for n in z.namelist()
                 if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
                key=lambda n: int(re.search(r"(\d+)", n).group(1)),
            )
        result.n_pages = len(slides)

        for page_idx, slide_path in enumerate(slides):
            rels = _load_rels(z, slide_path)
            root = ET.fromstring(z.read(slide_path))
            tree = root.find(f"{{{P}}}cSld/{{{P}}}spTree")
            if tree is None:
                continue
            items = []  # (y, x, kind, payload)
            for el in tree:
                if el.tag == f"{{{P}}}sp":
                    texts = _shape_text(el)
                    if not texts:
                        continue
                    y, x = _shape_xy(el)
                    w, h = _shape_wh(el)
                    kind = "title" if _is_title(el) else "text"
                    items.append((y, x, w, h, kind, texts))
                elif el.tag == f"{{{P}}}graphicFrame":
                    y, x = _shape_xy(el)
                    w, h = _shape_wh(el)
                    tbl = el.find(f".//{{{A}}}tbl")
                    if tbl is not None:
                        items.append((y, x, w, h, "table", _table_to_html(tbl)))
                    else:
                        from .chart import chart_part_to_html, find_chart_refs

                        for chart_path in find_chart_refs(el, rels):
                            html = chart_part_to_html(z, chart_path)
                            if html:
                                items.append((y, x, w, h, "table", html))
                elif el.tag == f"{{{P}}}pic":
                    y, x = _shape_xy(el)
                    w, h = _shape_wh(el)
                    blip = el.find(f".//{{{A}}}blip")
                    if blip is not None:
                        rid = blip.get(q("r:embed"))
                        target = rels.get(rid)
                        if target and target in z.namelist():
                            items.append(
                                (y, x, w, h, "image",
                                 (os.path.basename(target), z.read(target)))
                            )
            items = _sort_shapes(items)
            for _, _, _, _, kind, payload in items:
                if kind == "title":
                    result.add_title(payload[0], level=1, page=page_idx)
                    for extra in payload[1:]:
                        result.add_text(extra, page=page_idx)
                elif kind == "text":
                    result.add_text("\n".join(payload), page=page_idx)
                elif kind == "table":
                    result.add_table(payload, page=page_idx)
                elif kind == "image":
                    name, img = payload
                    result.add_image(f"s{page_idx}_{name}", img, page=page_idx)
    return result
