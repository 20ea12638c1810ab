"""OOXML chart -> HTML data table extraction."""
import os
import zipfile

import pytest

DEMO = "/root/reference/demo"
needs_demo = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="reference demo docs unavailable"
)

CHART_XML = b"""<?xml version="1.0"?>
<c:chartSpace xmlns:c="http://schemas.openxmlformats.org/drawingml/2006/chart"
              xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
 <c:chart><c:title><a:t>Revenue</a:t></c:title>
  <c:plotArea><c:barChart>
   <c:ser>
    <c:tx><c:strRef><c:strCache><c:pt idx="0"><c:v>Q1</c:v></c:pt></c:strCache></c:strRef></c:tx>
    <c:cat><c:strRef><c:strCache>
      <c:pt idx="0"><c:v>North</c:v></c:pt><c:pt idx="1"><c:v>South</c:v></c:pt>
    </c:strCache></c:strRef></c:cat>
    <c:val><c:numRef><c:numCache>
      <c:pt idx="0"><c:v>10.5</c:v></c:pt><c:pt idx="1"><c:v>20</c:v></c:pt>
    </c:numCache></c:numRef></c:val>
   </c:ser>
  </c:barChart></c:plotArea>
 </c:chart>
</c:chartSpace>"""


def test_chart_xml_to_html():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    html = chart_xml_to_html(CHART_XML)
    assert "<caption>Revenue</caption>" in html
    assert "<td>Q1</td>" in html
    assert "<td>North</td>" in html and "<td>South</td>" in html
    assert "<td>10.5</td>" in html and "<td>20</td>" in html


def test_chart_xml_no_cache_is_empty():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    assert chart_xml_to_html(b"<broken") == ""
    assert chart_xml_to_html(b"<x/>") == ""


@needs_demo
def test_docx_chart_extraction():
    from rapiddoc_tpu.office.chart import chart_part_to_html

    path = os.path.join(DEMO, "docx", "demo1-docx.docx")
    with zipfile.ZipFile(path) as z:
        html = chart_part_to_html(z, "word/charts/chart1.xml")
    assert html.startswith("<table>")
    assert html.count("<tr>") >= 4


@needs_demo
def test_xlsx_chart_in_blocks():
    from rapiddoc_tpu.office.xlsx import xlsx_to_blocks

    with open(os.path.join(DEMO, "xlsx", "xlsx_03_chartsheet.xlsx"), "rb") as f:
        res = xlsx_to_blocks(f.read())
    tables = [b for b in res.blocks if b.type == "table"]
    assert len(tables) >= 2  # data sheet + chartsheet chart


def test_office_caption_grouping():
    from rapiddoc_tpu.office.common import OfficeResult

    r = OfficeResult()
    r.add_text("intro paragraph")
    r.add_image("fig1.png", b"\x89PNG")
    r.add_text("Figure 1: an example chart")
    r.add_text("more body text")
    r.add_text("表 2 统计数据")
    r.add_table("<table><tr><td>x</td></tr></table>")
    items = r.to_content_list()
    img = next(i for i in items if i["type"] == "image")
    assert img["img_caption"] == ["Figure 1: an example chart"]
    tbl = next(i for i in items if i["type"] == "table")
    assert tbl["table_caption"] == ["表 2 统计数据"]
    texts = [i["text"] for i in items if i["type"] == "text"]
    assert "Figure 1: an example chart" not in texts


def test_pptx_shape_xycut_order():
    from rapiddoc_tpu.office.pptx import _sort_shapes

    # EMU-ish units; two columns of two shapes
    # wide column gutter (x gap 300 > y gap 50) -> column-first read
    lt = (100, 100, 400, 250, "text", ["left top"])
    lb = (400, 100, 400, 250, "text", ["left bottom"])
    rt = (100, 800, 400, 250, "text", ["right top"])
    rb = (400, 800, 400, 250, "text", ["right bottom"])
    out = _sort_shapes([rb, lt, rt, lb])
    texts = [it[5][0] for it in out]
    assert texts.index("left top") < texts.index("left bottom")
    assert texts.index("right top") < texts.index("right bottom")
    assert texts.index("left bottom") < texts.index("right top")
    # unknown extents fall back to (y, x)
    out2 = _sort_shapes([(200, 0, 0, 0, "text", ["b"]),
                         (100, 0, 0, 0, "text", ["a"])])
    assert [it[5][0] for it in out2] == ["a", "b"]


# ---- round-4 chart depth ----------------------------------------------------

C_NS = (
    'xmlns:c="http://schemas.openxmlformats.org/drawingml/2006/chart" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
)


def _num(vals):
    pts = "".join(
        f'<c:pt idx="{i}"><c:v>{v}</c:v></c:pt>' for i, v in enumerate(vals)
    )
    return f"<c:numRef><c:numCache>{pts}</c:numCache></c:numRef>"


def _ser(name, x, y, size=None, xy=True):
    tx = (
        f"<c:tx><c:strRef><c:strCache><c:pt idx=\"0\"><c:v>{name}</c:v>"
        "</c:pt></c:strCache></c:strRef></c:tx>"
    )
    xt, yt = ("xVal", "yVal") if xy else ("cat", "val")
    s = f"<c:ser>{tx}<c:{xt}>{_num(x)}</c:{xt}><c:{yt}>{_num(y)}</c:{yt}>"
    if size is not None:
        s += f"<c:bubbleSize>{_num(size)}</c:bubbleSize>"
    return s + "</c:ser>"


def test_scatter_chart_shared_x_single_column():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    xml = (
        f'<?xml version="1.0"?><c:chartSpace {C_NS}><c:chart><c:plotArea>'
        "<c:scatterChart>"
        + _ser("alpha", [1, 2, 3], [10, 20, 30])
        + _ser("beta", [1, 2, 3], [5, 6, 7])
        + "</c:scatterChart></c:plotArea></c:chart></c:chartSpace>"
    ).encode()
    html = chart_xml_to_html(xml)
    # shared x -> one x column, one column per series
    assert "<td>alpha</td>" in html and "<td>beta</td>" in html
    assert "alpha X" not in html
    assert "<tr><td>2</td><td>20</td><td>6</td></tr>" in html


def test_scatter_chart_distinct_x_per_series_columns():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    xml = (
        f'<?xml version="1.0"?><c:chartSpace {C_NS}><c:chart><c:plotArea>'
        "<c:scatterChart>"
        + _ser("alpha", [1, 2], [10, 20])
        + _ser("beta", [7, 8], [5, 6])
        + "</c:scatterChart></c:plotArea></c:chart></c:chartSpace>"
    ).encode()
    html = chart_xml_to_html(xml)
    assert "<td>alpha X</td>" in html and "<td>alpha Y</td>" in html
    assert "<td>beta X</td>" in html and "<td>beta Y</td>" in html
    assert "<tr><td>2</td><td>20</td><td>8</td><td>6</td></tr>" in html


def test_bubble_chart_size_columns():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    xml = (
        f'<?xml version="1.0"?><c:chartSpace {C_NS}><c:chart><c:plotArea>'
        "<c:bubbleChart>"
        + _ser("pop", [1, 2], [10, 20], size=[100, 200])
        + "</c:bubbleChart></c:plotArea></c:chart></c:chartSpace>"
    ).encode()
    html = chart_xml_to_html(xml)
    assert "<td>pop</td>" in html and "<td>pop size</td>" in html
    assert "<tr><td>1</td><td>10</td><td>100</td></tr>" in html


def test_date_axis_renders_iso_dates():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    # serial 45658 = 2025-01-01 (1900 system)
    xml = (
        f'<?xml version="1.0"?><c:chartSpace {C_NS}><c:chart><c:plotArea>'
        "<c:lineChart>"
        + _ser("sales", [45658, 45659], [1, 2], xy=False)
        + "</c:lineChart><c:dateAx/></c:plotArea></c:chart></c:chartSpace>"
    ).encode()
    html = chart_xml_to_html(xml)
    assert "2025-01-01" in html and "2025-01-02" in html


def test_multilevel_string_categories():
    from rapiddoc_tpu.office.chart import chart_xml_to_html

    cat = (
        "<c:cat><c:multiLvlStrRef><c:multiLvlStrCache>"
        '<c:lvl><c:pt idx="0"><c:v>Jan</c:v></c:pt>'
        '<c:pt idx="1"><c:v>Feb</c:v></c:pt></c:lvl>'
        '<c:lvl><c:pt idx="0"><c:v>2025</c:v></c:pt></c:lvl>'
        "</c:multiLvlStrCache></c:multiLvlStrRef></c:cat>"
    )
    xml = (
        f'<?xml version="1.0"?><c:chartSpace {C_NS}><c:chart><c:plotArea>'
        "<c:barChart><c:ser>"
        + cat
        + f"<c:val>{_num([3, 4])}</c:val>"
        + "</c:ser></c:barChart></c:plotArea></c:chart></c:chartSpace>"
    ).encode()
    html = chart_xml_to_html(xml)
    assert "<td>Jan / 2025</td>" in html
    assert "<td>Feb</td>" in html
