"""OOXML chart (DrawingML) -> HTML data table.

Behavioral counterpart of the reference chart extractor (reference:
rapid_doc/backend/utils/office_chart.py:40-405 — parse c:chart series
name/category/value caches into an HTML table, falling back to the
chart's embedded workbook). Implemented on stdlib ElementTree + the
package's own xlsx sheet parser (no openpyxl/lxml in this environment).
"""
from __future__ import annotations

import io
import zipfile
from html import escape as esc
from xml.etree import ElementTree as ET

C = "http://schemas.openxmlformats.org/drawingml/2006/chart"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"

PLOT_TAGS = (
    "areaChart", "area3DChart", "barChart", "bar3DChart", "bubbleChart",
    "doughnutChart", "lineChart", "line3DChart", "ofPieChart", "pieChart",
    "pie3DChart", "radarChart", "scatterChart", "stockChart",
    "surfaceChart", "surface3DChart",
)


def _c(tag: str) -> str:
    return f"{{{C}}}{tag}"


def _text_of(el) -> str:
    """All a:t / c:v descendant text joined."""
    if el is None:
        return ""
    parts = [t.text for t in el.iter(f"{{{A}}}t") if t.text]
    if not parts:
        parts = [v.text for v in el.iter(_c("v")) if v.text]
    return " ".join(p.strip() for p in parts if p and p.strip())


def _cache_points(ref_parent) -> list[str]:
    """Values from a c:strRef/c:numRef cache (or c:strLit/c:numLit) under
    `ref_parent` (a c:cat / c:val / c:xVal / c:yVal / c:tx element)."""
    if ref_parent is None:
        return []
    pts: dict[int, str] = {}
    for cache_tag in ("strCache", "numCache", "strLit", "numLit"):
        for cache in ref_parent.iter(_c(cache_tag)):
            for pt in cache.findall(_c("pt")):
                v = pt.find(_c("v"))
                if v is not None and v.text is not None:
                    idx = int(pt.get("idx", len(pts)))
                    pts[idx] = _fmt_number(v.text)
    if not pts:
        return []
    return [pts.get(i, "") for i in range(max(pts) + 1)]


def _fmt_number(text: str) -> str:
    try:
        f = float(text)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return f"{f:.6g}"
    except ValueError:
        return text


def _series_name(ser) -> str:
    tx = ser.find(_c("tx"))
    if tx is None:
        return ""
    vals = _cache_points(tx)
    if vals:
        return vals[0]
    return _text_of(tx)


def chart_xml_to_html(chart_xml: bytes) -> str:
    """Chart part XML -> HTML table of its cached data (series x cats).
    Empty string when the chart carries no usable cache."""
    try:
        root = ET.fromstring(chart_xml)
    except ET.ParseError:
        return ""
    title = ""
    chart = root.find(_c("chart"))
    if chart is not None:
        title_el = chart.find(_c("title"))
        if title_el is not None:
            title = _text_of(title_el)

    series = []
    scatter = False
    for plot_tag in PLOT_TAGS:
        for plot in root.iter(_c(plot_tag)):
            for ser in plot.findall(_c("ser")):
                name = _series_name(ser)
                cat_el = ser.find(_c("cat"))
                if cat_el is None:
                    cat_el = ser.find(_c("xVal"))
                val_el = ser.find(_c("val"))
                if val_el is None:
                    val_el = ser.find(_c("yVal"))
                cats = _cache_points(cat_el)
                vals = _cache_points(val_el)
                if ser.find(_c("xVal")) is not None:
                    scatter = True
                if vals:
                    series.append((name, cats, vals))
    if not series:
        return ""

    # union category axis (scatter: x values act as categories per series)
    n_rows = max(
        max(len(c), len(v)) for _, c, v in series
    )
    cats_axis = next((c for _, c, v in series if len(c) >= n_rows), None)
    if cats_axis is None:
        cats_axis = [str(i + 1) for i in range(n_rows)]

    head = ["<tr><td></td>"]
    for i, (name, _, _) in enumerate(series):
        head.append(f"<td>{esc(name or f'Series {i + 1}', quote=False)}</td>")
    head.append("</tr>")
    rows = []
    for r in range(n_rows):
        cells = [f"<td>{esc(cats_axis[r] if r < len(cats_axis) else '', quote=False)}</td>"]
        for _, cats, vals in series:
            if scatter and cats is not cats_axis and r < len(cats):
                # scatter series keep their own x in the value cell
                val = f"({cats[r]}, {vals[r] if r < len(vals) else ''})"
            else:
                val = vals[r] if r < len(vals) else ""
            cells.append(f"<td>{esc(val, quote=False)}</td>")
        rows.append("<tr>" + "".join(cells) + "</tr>")
    caption = (
        f"<caption>{esc(title, quote=False)}</caption>" if title else ""
    )
    return f"<table>{caption}{''.join(head)}{''.join(rows)}</table>"


def chart_part_to_html(z: zipfile.ZipFile, chart_path: str) -> str:
    """Chart part -> HTML. Prefers the XML value caches; falls back to the
    embedded workbook (reference: office_chart.py
    html_table_from_excel_bytes)."""
    if chart_path not in z.namelist():
        return ""
    html = chart_xml_to_html(z.read(chart_path))
    if html:
        return html
    # fallback: embedded workbook referenced from the chart part rels
    from .docx import _load_rels

    rels = _load_rels(z, chart_path)
    for target in rels.values():
        if target.endswith((".xlsx", ".xlsm")) and target in z.namelist():
            html = _embedded_workbook_to_html(z.read(target))
            if html:
                return html
    return ""


def _embedded_workbook_to_html(xlsx_bytes: bytes) -> str:
    from .xlsx import _shared_strings, _sheet_to_html

    try:
        with zipfile.ZipFile(io.BytesIO(xlsx_bytes)) as wz:
            shared = _shared_strings(wz)
            for name in sorted(wz.namelist()):
                if name.startswith("xl/worksheets/sheet") and name.endswith(
                    ".xml"
                ):
                    tables = _sheet_to_html(wz, name, shared)
                    if tables:
                        return tables[0]
    except (zipfile.BadZipFile, ET.ParseError, KeyError):
        pass
    return ""


def find_chart_refs(el, rels: dict[str, str]) -> list[str]:
    """Chart part paths referenced from a drawing/graphicFrame element."""
    out = []
    for ch in el.iter(_c("chart")):
        rid = ch.get(
            "{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}id"
        )
        target = rels.get(rid)
        if target:
            out.append(target)
    return out
