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
_M_NS = NS["m"]
# the three node kinds that carry inline OMML in a pptx paragraph
_MATH_TAGS = frozenset({
    f"{{{NS['a14']}}}m",
    f"{{{_M_NS}}}oMath",
    f"{{{_M_NS}}}oMathPara",
})
_MC_NS = "http://schemas.openxmlformats.org/markup-compatibility/2006"


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


def _run_style_key(rpr) -> tuple | None:
    """Hashable style signature of a run (None = unstyled)."""
    if rpr is None:
        return None
    key = (
        rpr.get("b") == "1",
        rpr.get("i") == "1",
        (rpr.get("u") or "none") != "none",
        (rpr.get("strike") or "noStrike") != "noStrike",
        rpr.get("baseline", "0"),
    )
    return key if any(key[:4]) or key[4] not in ("0", "") else None


def _wrap_run_style(text: str, rpr) -> str:
    """DrawingML run styling -> inline wrappers via the shared office
    renderer (reference: office_rich_text.py formatting; a:rPr
    b/i/u/strike/baseline attributes)."""
    if not text:
        return text
    styles = set()
    if rpr.get("b") == "1":
        styles.add("bold")
    if rpr.get("i") == "1":
        styles.add("italic")
    if (rpr.get("u") or "none") != "none":
        styles.add("underline")
    if (rpr.get("strike") or "noStrike") != "noStrike":
        styles.add("strikethrough")
    try:
        baseline = int(rpr.get("baseline", "0"))
    except ValueError:
        baseline = 0
    if baseline > 0:
        styles.add("superscript")
    elif baseline < 0:
        styles.add("subscript")
    from .common import wrap_inline_style

    return wrap_inline_style(text, styles)


def _shape_text(sp, rels: dict | None = None) -> list[str]:
    """Paragraph texts of a shape: runs joined (hyperlinks become
    markdown links via `rels`), `a:br` as newline, bullet paragraphs
    (`a:buChar`/`a:buAutoNum`, reference pptx_converter.py:1508-1560)
    prefixed as markdown list items with `a:pPr lvl` indentation."""
    out = []
    txbody = sp.find(f"{{{P}}}txBody")
    if txbody is None:
        txbody = sp.find(f"{{{A}}}txBody")
    if txbody is None:
        return out
    auto_counters: dict[int, int] = {}
    for para in txbody.findall(f"{{{A}}}p"):
        # (text, rpr-or-None, link-target) segments; adjacent runs with
        # identical styling+link merge before wrapping so split runs
        # don't emit "**bo****ld**"
        segs: list[list] = []
        for el in para:
            if el.tag == f"{{{A}}}r":
                t = el.find(f"{{{A}}}t")
                if t is None or not t.text:
                    continue
                rpr = el.find(f"{{{A}}}rPr")
                link = None
                if rpr is not None and rels:
                    hl = rpr.find(f"{{{A}}}hlinkClick")
                    if hl is not None:
                        target = rels.get(hl.get(q("r:id")))
                        if target and target.startswith(
                            ("http://", "https://")
                        ):
                            link = target
                key = (_run_style_key(rpr), link)
                if segs and segs[-1][1] == key:
                    segs[-1][0] += t.text
                else:
                    segs.append([t.text, key, rpr])
            elif el.tag == f"{{{A}}}br":
                segs.append(["\n", (None, None), None])
            elif el.tag in _MATH_TAGS:
                # a14:m-wrapped, bare m:oMath, or m:oMathPara equation
                # inline in the paragraph -> $latex$ at its run position
                # (explicit tag set like the reference's
                # _is_math_content_node — endswith('}m') would match
                # local name 'm' in ANY namespace and miss oMathPara)
                from .omml import omml_to_latex

                maths = (
                    [el] if el.tag == f"{{{_M_NS}}}oMath"
                    else el.findall(f"{{{_M_NS}}}oMath")
                    or [
                        d for d in el.iter()
                        if d.tag == f"{{{_M_NS}}}oMath"
                    ]
                )
                for om in maths:
                    latex = omml_to_latex(om)
                    if latex:
                        segs.append([f"${latex}$", (None, None), None])
        parts = []
        for seg_text, (style_key, link), rpr in segs:
            if rpr is not None and style_key:
                seg_text = _wrap_run_style(seg_text, rpr)
            if link:
                seg_text = f"[{seg_text}]({link})"
            parts.append(seg_text)
        text = "".join(parts).strip()
        if not text:
            continue
        ppr = para.find(f"{{{A}}}pPr")
        lvl = int(ppr.get("lvl", "0")) if ppr is not None else 0
        bu_char = ppr.find(f"{{{A}}}buChar") if ppr is not None else None
        bu_auto = ppr.find(f"{{{A}}}buAutoNum") if ppr is not None else None
        bu_none = ppr.find(f"{{{A}}}buNone") if ppr is not None else None
        if bu_auto is not None and bu_none is None:
            auto_counters[lvl] = auto_counters.get(lvl, 0) + 1
            for deeper in [k for k in auto_counters if k > lvl]:
                auto_counters.pop(deeper)
            text = "  " * lvl + f"{auto_counters[lvl]}. " + text
        elif bu_char is not None and bu_none is None:
            text = "  " * lvl + "- " + text
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


# (scale_x, scale_y, trans_x, trans_y): child EMU -> slide EMU
_IDENTITY = (1.0, 1.0, 0.0, 0.0)


def _compose_group_transform(grp, outer) -> tuple[float, float, float, float]:
    """Group shapes position children in a child coordinate space
    (`a:chOff`/`a:chExt`) mapped onto the group's own box (`a:off`/
    `a:ext`) — compose that affine map with the outer transform
    (reference: pptx_converter.py:342 _group_shape_transform)."""
    xfrm = grp.find(f"{{{P}}}grpSpPr/{{{A}}}xfrm")
    if xfrm is None:
        return outer
    def _pt(el, default=(0, 0)):
        if el is None:
            return default
        try:
            return int(el.get("x", el.get("cx", "0"))), int(
                el.get("y", el.get("cy", "0"))
            )
        except ValueError:
            return default
    ox, oy = _pt(xfrm.find(f"{{{A}}}off"))
    ex, ey = _pt(xfrm.find(f"{{{A}}}ext"), (1, 1))
    cox, coy = _pt(xfrm.find(f"{{{A}}}chOff"))
    cex, cey = _pt(xfrm.find(f"{{{A}}}chExt"), (ex, ey))
    sx = ex / cex if cex else 1.0
    sy = ey / cey if cey else 1.0
    # child -> group-local -> outer
    osx, osy, otx, oty = outer
    return (
        osx * sx,
        osy * sy,
        otx + osx * (ox - sx * cox),
        oty + osy * (oy - sy * coy),
    )


def _collect_shapes(tree, z, rels, tf) -> list[tuple]:
    """Walk an spTree, recursing into p:grpSp with composed transforms;
    returns (y, x, w, h, kind, payload) items in slide coordinates."""
    sx, sy, tx, ty = tf
    items: list[tuple] = []

    def _place(el):
        y, x = _shape_xy(el)
        w, h = _shape_wh(el)
        if x >= (1 << 60) or y >= (1 << 60):
            return y, x, w, h
        return (
            int(ty + sy * y),
            int(tx + sx * x),
            int(sx * w),
            int(sy * h),
        )

    for el in tree:
        if el.tag == f"{{{_MC_NS}}}AlternateContent":
            # take mc:Choice (richer content: equations, new drawing
            # features); mc:Fallback duplicates it as a picture
            branch = el.find(f"{{{_MC_NS}}}Choice")
            if branch is None:
                branch = el.find(f"{{{_MC_NS}}}Fallback")
            if branch is not None:
                items.extend(_collect_shapes(branch, z, rels, tf))
        elif el.tag == f"{{{P}}}grpSp":
            items.extend(
                _collect_shapes(el, z, rels, _compose_group_transform(el, tf))
            )
        elif el.tag == f"{{{P}}}sp":
            texts = _shape_text(el, rels)
            if not texts:
                continue
            y, x, w, h = _place(el)
            kind = "title" if _is_title(el) else "text"
            items.append((y, x, w, h, kind, texts))
        elif el.tag == f"{{{P}}}graphicFrame":
            y, x, w, h = _place(el)
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
            y, x, w, h = _place(el)
            blip = el.find(f".//{{{A}}}blip")
            if blip is not None:
                rid = blip.get(q("r:embed"))
                target = rels.get(rid)
                if target and target in z.namelist():
                    items.append(
                        (y, x, w, h, "image",
                         (os.path.basename(target), z.read(target)))
                    )
    return items


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
            try:
                root = ET.fromstring(z.read(slide_path))
            except (ET.ParseError, KeyError):
                # per-slide failure isolation (reference: per-page skip,
                # cli/common.py:138-144): one corrupt slide must not
                # take the deck's other slides down
                continue
            tree = root.find(f"{{{P}}}cSld/{{{P}}}spTree")
            if tree is None:
                continue
            items = _collect_shapes(tree, z, rels, _IDENTITY)
            items = _sort_shapes(items)
            notes = _slide_notes(z, slide_path, rels)
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
            for note in notes:
                result.add_text(note, page=page_idx)
    return result


def _slide_notes(z, slide_path: str, rels: dict) -> list[str]:
    """Speaker-notes paragraphs for a slide, appended after the slide
    body (reference: pptx_converter.py:548 _handle_slide_notes emits
    them as page footnotes). Slide-number/metadata placeholders are
    skipped; bare page numbers are dropped."""
    notes_path = next(
        (t for t in rels.values() if "notesSlide" in t and t in z.namelist()),
        None,
    )
    if notes_path is None:
        return []
    try:
        root = ET.fromstring(z.read(notes_path))
    except ET.ParseError:
        return []
    out: list[str] = []
    for sp in root.iter(f"{{{P}}}sp"):
        ph = sp.find(f".//{{{P}}}ph")
        if ph is not None and ph.get("type") in ("sldNum", "dt", "ftr", "sldImg"):
            continue
        for text in _shape_text(sp):
            if text.strip().isdigit():
                continue
            out.append(text)
    return out
