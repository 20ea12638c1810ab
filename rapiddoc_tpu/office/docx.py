"""DOCX -> blocks converter (pure OOXML walk over zip+XML).

Behavioral counterpart of the reference docx converter
(reference: rapid_doc/model/docx/docx_converter.py + main.py:12): body
paragraphs with heading styles, runs + hyperlinks, OMML math -> LaTeX,
tables (gridSpan/vMerge -> HTML), embedded images, numbered/bulleted lists.
"""
from __future__ import annotations

import io
import os
import re
import zipfile
from xml.etree import ElementTree as ET

from .common import NS, OfficeResult, esc, q
from .omml import omml_to_latex

_HEADING_RE = re.compile(r"(?:heading|biaoti)\s*([1-6])", re.I)


def _load_rels(z: zipfile.ZipFile, part: str) -> dict[str, str]:
    """rels for a part: rId -> target path (resolved)."""
    base = os.path.dirname(part)
    rels_path = f"{base}/_rels/{os.path.basename(part)}.rels"
    out: dict[str, str] = {}
    if rels_path not in z.namelist():
        return out
    root = ET.fromstring(z.read(rels_path))
    for rel in root:
        rid = rel.get("Id")
        target = rel.get("Target") or ""
        mode = rel.get("TargetMode")
        if mode == "External":
            out[rid] = target
        else:
            resolved = os.path.normpath(os.path.join(base, target)).replace("\\", "/")
            out[rid] = resolved
    return out


def _style_headings(z: zipfile.ZipFile) -> dict[str, int]:
    """styleId -> heading level from styles.xml."""
    out: dict[str, int] = {}
    if "word/styles.xml" not in z.namelist():
        return out
    try:
        root = ET.fromstring(z.read("word/styles.xml"))
    except ET.ParseError:
        return out
    for style in root.findall(q("w:style")):
        sid = style.get(q("w:styleId"))
        name_el = style.find(q("w:name"))
        name = name_el.get(q("w:val")) if name_el is not None else ""
        m = _HEADING_RE.search(name or "") or _HEADING_RE.search(sid or "")
        if m and sid:
            out[sid] = int(m.group(1))
    return out


_MC_FALLBACK = (
    "{http://schemas.openxmlformats.org/markup-compatibility/2006}Fallback"
)


def _textbox_contents(el) -> list:
    """w:txbxContent descendants, excluding mc:Fallback duplicates."""
    out: list = []

    def walk(node):
        for c in node:
            if c.tag == _MC_FALLBACK:
                continue
            if c.tag == q("w:txbxContent"):
                out.append(c)
            else:
                walk(c)

    walk(el)
    return out


def _para_text(p, rels: dict[str, str]) -> str:
    """Concatenate run text, tabs, breaks and hyperlinks of a paragraph."""
    parts: list[str] = []

    def walk_runs(el):
        for child in el:
            tag = child.tag
            if tag == q("w:r"):
                for sub in child:
                    if sub.tag == q("w:t"):
                        parts.append(sub.text or "")
                    elif sub.tag == q("w:tab"):
                        parts.append("\t")
                    elif sub.tag in (q("w:br"), q("w:cr")):
                        parts.append("\n")
                # text boxes ride inside run-level drawings (reference:
                # docx_converter textbox handling); mc:Fallback mirrors
                # mc:Choice content and must be skipped to avoid doubles
                for txbx in _textbox_contents(child):
                    for inner_p in txbx.findall(q("w:p")):
                        inner = _para_text(inner_p, rels)
                        if inner.strip():
                            parts.append(inner.strip() + "\n")
            elif tag == q("w:hyperlink"):
                rid = child.get(q("r:id"))
                text_before = len(parts)
                walk_runs(child)
                link_text = "".join(parts[text_before:])
                del parts[text_before:]
                href = rels.get(rid, "")
                if href and link_text:
                    parts.append(f"[{link_text}]({href})")
                else:
                    parts.append(link_text)
            elif tag in (q("w:ins"), q("w:smartTag")):
                walk_runs(child)
    walk_runs(p)
    return "".join(parts)


def _para_images(p, rels: dict[str, str], z: zipfile.ZipFile) -> list[tuple[str, bytes]]:
    out = []
    for blip in p.iter(f"{{{NS['a']}}}blip"):
        rid = blip.get(q("r:embed")) or blip.get(q("r:link"))
        target = rels.get(rid)
        if target and target in z.namelist():
            out.append((os.path.basename(target), z.read(target)))
    return out


def _para_math(p) -> list[str]:
    out = []
    for math_el in list(p.iter(f"{{{NS['m']}}}oMath")):
        latex = omml_to_latex(math_el)
        if latex:
            out.append(latex)
    return out


def _is_list_para(p) -> bool:
    ppr = p.find(q("w:pPr"))
    return ppr is not None and ppr.find(q("w:numPr")) is not None


def _table_to_html(tbl, rels: dict[str, str]) -> str:
    rows_html = []
    vmerge_tracker: dict[int, int] = {}
    for tr in tbl.findall(q("w:tr")):
        cells = []
        col = 0
        for tc in tr.findall(q("w:tc")):
            tcpr = tc.find(q("w:tcPr"))
            colspan = 1
            vmerge = None
            if tcpr is not None:
                gs = tcpr.find(q("w:gridSpan"))
                if gs is not None:
                    colspan = int(gs.get(q("w:val"), "1"))
                vm = tcpr.find(q("w:vMerge"))
                if vm is not None:
                    vmerge = vm.get(q("w:val"), "continue")
            text = "\n".join(
                _para_text(p, rels) for p in tc.findall(q("w:p"))
            ).strip()
            if vmerge == "continue":
                vmerge_tracker[col] = vmerge_tracker.get(col, 1) + 1
                col += colspan
                continue
            attrs = ""
            if colspan > 1:
                attrs += f' colspan="{colspan}"'
            cells.append((col, attrs, text))
            col += colspan
        rows_html.append(cells)
    # second pass: compute rowspans from vmerge-continue counts (approximate:
    # count continues below each restart cell)
    html_rows = []
    for r, cells in enumerate(rows_html):
        tds = []
        for col, attrs, text in cells:
            rowspan = 1
            for r2 in range(r + 1, len(rows_html)):
                cols_present = [c for c, _, _ in rows_html[r2]]
                if col in cols_present:
                    break
                rowspan += 1
            if rowspan > 1 and "rowspan" not in attrs:
                attrs += f' rowspan="{rowspan}"'
            tds.append(f"<td{attrs}>{esc(text)}</td>")
        html_rows.append("<tr>" + "".join(tds) + "</tr>")
    return "<table>" + "".join(html_rows) + "</table>"


def docx_to_blocks(data: bytes) -> OfficeResult:
    result = OfficeResult()
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        if "word/document.xml" not in z.namelist():
            raise ValueError("invalid docx: no word/document.xml")
        rels = _load_rels(z, "word/document.xml")
        headings = _style_headings(z)
        root = ET.fromstring(z.read("word/document.xml"))
        body = root.find(q("w:body"))
        if body is None:
            return result
        pending_list: list[str] = []

        def flush_list():
            if pending_list:
                result.add_text("\n".join(f"- {t}" for t in pending_list))
                pending_list.clear()

        for el in body:
            if el.tag == q("w:p"):
                maths = _para_math(el)
                text = _para_text(el, rels)
                images = _para_images(el, rels, z)
                ppr = el.find(q("w:pPr"))
                style = None
                if ppr is not None:
                    ps = ppr.find(q("w:pStyle"))
                    if ps is not None:
                        style = ps.get(q("w:val"))
                level = headings.get(style or "", 0)
                if maths and not text.strip():
                    flush_list()
                    for latex in maths:
                        result.add_equation(latex)
                elif level:
                    flush_list()
                    result.add_title(text, level)
                elif _is_list_para(el) and text.strip():
                    pending_list.append(text.strip())
                else:
                    flush_list()
                    if text.strip():
                        result.add_text(text)
                for name, img_data in images:
                    flush_list()
                    result.add_image(name, img_data)
                from .chart import chart_part_to_html, find_chart_refs

                for chart_path in find_chart_refs(el, rels):
                    html = chart_part_to_html(z, chart_path)
                    if html:
                        flush_list()
                        result.add_table(html)
            elif el.tag == q("w:tbl"):
                flush_list()
                result.add_table(_table_to_html(el, rels))
        flush_list()
    return result
