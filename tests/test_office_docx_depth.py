"""docx converter depth: numbering.xml list formats, footnotes/endnotes,
nested tables (reference: rapid_doc/model/docx/docx_converter.py scope)."""
import io
import zipfile

from rapiddoc_tpu.office.docx import docx_to_blocks

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'

CONTENT_TYPES = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    'package/2006/content-types"><Default Extension="xml" ContentType="app'
    'lication/xml"/></Types>'
)

NUMBERING = f"""<?xml version="1.0"?>
<w:numbering {W}>
  <w:abstractNum w:abstractNumId="0">
    <w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/></w:lvl>
    <w:lvl w:ilvl="1"><w:numFmt w:val="lowerLetter"/><w:lvlText w:val="%2)"/></w:lvl>
  </w:abstractNum>
  <w:abstractNum w:abstractNumId="1">
    <w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/><w:lvlText w:val=""/></w:lvl>
  </w:abstractNum>
  <w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>
  <w:num w:numId="2"><w:abstractNumId w:val="1"/></w:num>
</w:numbering>"""

FOOTNOTES = f"""<?xml version="1.0"?>
<w:footnotes {W}>
  <w:footnote w:id="-1"><w:p><w:r><w:t>sep</w:t></w:r></w:p></w:footnote>
  <w:footnote w:id="1"><w:p><w:r><w:t>the footnote body</w:t></w:r></w:p></w:footnote>
</w:footnotes>"""


def _p(text, num=None, ilvl=0):
    npr = (
        f'<w:pPr><w:numPr><w:ilvl w:val="{ilvl}"/>'
        f'<w:numId w:val="{num}"/></w:numPr></w:pPr>'
        if num
        else ""
    )
    return f"<w:p>{npr}<w:r><w:t>{text}</w:t></w:r></w:p>"


def make_docx(body_xml: str, extra_parts: dict | None = None) -> bytes:
    doc = f'<?xml version="1.0"?><w:document {W}><w:body>{body_xml}</w:body></w:document>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("word/document.xml", doc)
        for name, data in (extra_parts or {}).items():
            z.writestr(name, data)
    return buf.getvalue()


def _texts(result) -> str:
    return "\n".join(
        x
        for b in result.blocks
        for x in (b.text, b.html, "\n".join(b.items))
        if x
    )


def test_numbered_lists_with_formats_and_levels():
    body = (
        _p("first", num=1) + _p("second", num=1)
        + _p("subitem", num=1, ilvl=1)
        + _p("third", num=1)
        + _p("bullet item", num=2)
    )
    res = docx_to_blocks(
        make_docx(body, {"word/numbering.xml": NUMBERING})
    )
    text = _texts(res)
    assert "1. first" in text
    assert "2. second" in text
    assert "a) subitem" in text
    assert "3. third" in text
    assert "- bullet item" in text


def test_footnotes_render_markers_and_body():
    body = (
        "<w:p><w:r><w:t>claim</w:t></w:r>"
        '<w:r><w:footnoteReference w:id="1"/></w:r></w:p>'
    )
    res = docx_to_blocks(
        make_docx(body, {"word/footnotes.xml": FOOTNOTES})
    )
    text = _texts(res)
    assert "claim[^1]" in text
    assert "[^1]: the footnote body" in text
    assert "sep" not in text  # separator pseudo-footnotes skipped


def test_nested_table_renders_inline():
    inner = (
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
    )
    body = (
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>"
        + inner
        + "</w:tc></w:tr></w:tbl>"
    )
    res = docx_to_blocks(make_docx(body))
    html = _texts(res)
    assert html.count("<table>") == 2
    assert "outer" in html and "inner" in html


def test_xlsx_date_and_percent_formats():
    """styles.xml numFmt -> serial dates as ISO, fractions as percent."""
    from rapiddoc_tpu.office.xlsx import xlsx_to_blocks

    S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{S}" xmlns:r="{R}">'
        '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxml'
        'formats.org/package/2006/relationships"><Relationship Id="rId1" '
        'Type="x" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    styles = (
        f'<?xml version="1.0"?><styleSheet xmlns="{S}"><cellXfs count="3">'
        '<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="10"/>'
        "</cellXfs></styleSheet>"
    )
    # 45658 = 2025-01-01 ; 0.375 with percent style -> 37.5%
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="1">'
        '<c r="A1" s="1"><v>45658</v></c>'
        '<c r="B1" s="2"><v>0.375</v></c>'
        '<c r="C1"><v>7</v></c>'
        "</row></sheetData></worksheet>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    res = xlsx_to_blocks(buf.getvalue())
    html = "\n".join(b.html for b in res.blocks if b.html)
    assert "2025-01-01" in html
    assert "37.5%" in html
    assert "<td>7</td>" in html


def test_caption_tie_up_by_index():
    """Reference two-layer grouping semantics (magic_model_utils
    tie_up_category_by_index): a caption between two bodies attaches to
    the body at minimal effective index distance, preferring the earlier
    one on ties; prefix-matched text right after a body is a caption
    even without a number."""
    from rapiddoc_tpu.office.common import OfficeResult

    doc = OfficeResult()
    doc.add_image("a.png", b"x")            # 0: image body
    doc.add_text("Figure 1: first chart")   # 1: caption (tie -> image 0)
    doc.add_table("<table><tr><td>1</td></tr></table>")  # 2: table body
    doc.add_text("Table note follows")      # 3: rule-5 prefix caption
    doc.add_text("Plain paragraph.")        # 4: text
    items = doc.to_content_list()
    img = next(i for i in items if i["type"] == "image")
    tbl = next(i for i in items if i["type"] == "table")
    assert img.get("img_caption") == ["Figure 1: first chart"]
    assert tbl.get("table_caption") == ["Table note follows"]
    # captions no longer appear as standalone text items
    texts = [i["text"] for i in items if i["type"] == "text"]
    assert texts == ["Plain paragraph."]


def test_caption_runs_between_body_and_caption():
    """A run of several captions below one image all attach to it."""
    from rapiddoc_tpu.office.common import OfficeResult

    doc = OfficeResult()
    doc.add_text("Intro text")
    doc.add_image("b.png", b"x")
    doc.add_text("Figure 2: part a")
    doc.add_text("Figure 3: part b")  # adjacent through the caption run
    items = doc.to_content_list()
    img = next(i for i in items if i["type"] == "image")
    assert img.get("img_caption") == ["Figure 2: part a",
                                      "Figure 3: part b"]


def test_xlsx_data_islands_split_and_trim():
    """Reference _find_data_tables semantics: blank-margin rows/columns
    are trimmed and data islands separated by >gap+1 empty rows become
    separate tables (fixture analogue: xlsx_05/xlsx_07)."""
    from rapiddoc_tpu.office.xlsx import xlsx_to_blocks

    S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{S}" xmlns:r="{R}">'
        '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxml'
        'formats.org/package/2006/relationships"><Relationship Id="rId1" '
        'Type="x" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    # data starts at C3 (cols A-B and rows 1-2 empty); a second island
    # at C9 is 4 blank rows below the first -> separate table
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="3"><c r="C3" t="str"><v>H1</v></c>'
        '<c r="D3" t="str"><v>H2</v></c></row>'
        '<row r="4"><c r="C4"><v>1</v></c><c r="D4"><v>2</v></c></row>'
        '<row r="9"><c r="C9" t="str"><v>K1</v></c>'
        '<c r="D9" t="str"><v>K2</v></c></row>'
        "</sheetData></worksheet>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    res = xlsx_to_blocks(buf.getvalue())
    tables = [b.html for b in res.blocks if b.html]
    assert len(tables) == 2
    # no empty leading cells: first cell of first table is H1
    assert tables[0].startswith("<table><tr><td>H1</td><td>H2</td></tr>")
    assert tables[1] == "<table><tr><td>K1</td><td>K2</td></tr></table>"


def test_inline_rich_text_styles():
    """Run-level bold/italic/underline/strike/super/subscript render as
    markdown(+HTML) wrappers; adjacent same-style runs merge (reference:
    utils/office_rich_text.py + office/mkcontent/inline_renderer.py)."""
    body = (
        "<w:p>"
        '<w:r><w:rPr><w:b/></w:rPr><w:t>bo</w:t></w:r>'
        '<w:r><w:rPr><w:b/></w:rPr><w:t>ld</w:t></w:r>'
        "<w:r><w:t> plain </w:t></w:r>"
        '<w:r><w:rPr><w:i/></w:rPr><w:t>it</w:t></w:r>'
        '<w:r><w:rPr><w:b/><w:i/></w:rPr><w:t>both</w:t></w:r>'
        '<w:r><w:rPr><w:strike/></w:rPr><w:t>gone</w:t></w:r>'
        '<w:r><w:rPr><w:u w:val="single"/></w:rPr><w:t>under</w:t></w:r>'
        '<w:r><w:rPr><w:vertAlign w:val="superscript"/></w:rPr><w:t>2</w:t></w:r>'
        "</w:p>"
    )
    res = docx_to_blocks(make_docx(body))
    text = _texts(res)
    assert "**bold**" in text           # merged adjacent bold runs
    assert " plain " in text
    assert "*it*" in text
    assert "***both***" in text
    assert "~~gone~~" in text
    assert "<u>under</u>" in text
    assert "<sup>2</sup>" in text


def test_rich_text_stays_plain_in_titles_tables_blankruns():
    body = (
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        '<w:r><w:rPr><w:b/></w:rPr><w:t>Title</w:t></w:r></w:p>'
        # bold whitespace-only run: style dropped
        '<w:p><w:r><w:t>a</w:t></w:r>'
        '<w:r><w:rPr><w:b/></w:rPr><w:t> </w:t></w:r>'
        "<w:r><w:t>b</w:t></w:r></w:p>"
        '<w:tbl><w:tr><w:tc><w:p><w:r><w:rPr><w:b/></w:rPr>'
        "<w:t>cell</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
    )
    styles = (
        f'<?xml version="1.0"?><w:styles {W}>'
        '<w:style w:styleId="Heading1"><w:name w:val="heading 1"/></w:style>'
        "</w:styles>"
    )
    res = docx_to_blocks(
        make_docx(body, extra_parts={"word/styles.xml": styles})
    )
    text = _texts(res)
    assert "Title" in text and "**Title**" not in text
    assert "a b" in text
    assert "<td>cell</td>" in text  # cells escape -> keep plain


def test_heading_keeps_footnote_marker():
    """Footnote refs inside a heading keep their [^n] marker (the
    heading re-parse must not drop it)."""
    body = (
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        "<w:r><w:t>Title</w:t></w:r>"
        '<w:r><w:footnoteReference w:id="1"/></w:r></w:p>'
    )
    styles = (
        f'<?xml version="1.0"?><w:styles {W}>'
        '<w:style w:styleId="Heading1"><w:name w:val="heading 1"/></w:style>'
        "</w:styles>"
    )
    res = docx_to_blocks(
        make_docx(
            body,
            extra_parts={
                "word/styles.xml": styles,
                "word/footnotes.xml": FOOTNOTES,
            },
        )
    )
    text = _texts(res)
    assert "Title[^1]" in text
    assert "[^1]: the footnote body" in text


def test_whitespace_only_underline_run():
    """Underline on pure whitespace keeps the whitespace (once) inside
    the tag; bold on whitespace is dropped."""
    body = (
        "<w:p><w:r><w:t>a</w:t></w:r>"
        '<w:r><w:rPr><w:u w:val="single"/></w:rPr>'
        '<w:t xml:space="preserve">  </w:t></w:r>'
        "<w:r><w:t>b</w:t></w:r></w:p>"
    )
    res = docx_to_blocks(make_docx(body))
    text = _texts(res)
    assert "a<u>  </u>b" in text


M = 'xmlns:m="http://schemas.openxmlformats.org/officeDocument/2006/math"'


def _math(latex_body):
    return f"<m:oMath {M}><m:r><m:t>{latex_body}</m:t></m:r></m:oMath>"


def test_inline_math_in_mixed_paragraph():
    # prose + OMML in one paragraph: math renders inline at its run
    # position (reference: docx_converter
    # _build_text_with_equations_and_hyperlinks)
    body = (
        f"<w:p><w:r><w:t>Euler says </w:t></w:r>{_math('e=mc2')}"
        "<w:r><w:t> holds.</w:t></w:r></w:p>"
    )
    res = docx_to_blocks(make_docx(body))
    texts = [b.text for b in res.blocks if b.type == "text"]
    assert texts == ["Euler says $e=mc2$ holds."]
    assert not [b for b in res.blocks if b.type == "equation"]


def test_pure_math_paragraph_stays_interline():
    body = f"<w:p>{_math('a+b')}</w:p>"
    res = docx_to_blocks(make_docx(body))
    eqs = [b for b in res.blocks if b.type == "equation"]
    assert len(eqs) == 1 and eqs[0].text == "a+b"


def test_math_inside_table_cell():
    # reference injects $..$ into cell HTML (_inject_equations_into_table)
    body = (
        "<w:tbl><w:tr><w:tc>"
        f"<w:p><w:r><w:t>area </w:t></w:r>{_math('pi r^2')}</w:p>"
        "</w:tc></w:tr></w:tbl>"
    )
    res = docx_to_blocks(make_docx(body))
    tables = [b.html for b in res.blocks if b.type == "table"]
    assert len(tables) == 1
    assert "area $pi r^2$" in tables[0]


def test_section_breaks_paginate():
    # sections map to pages (reference: docx_converter _start_new_page
    # on non-layout-only sectPr); explicit w:br page breaks do not
    sect = (
        '<w:p><w:pPr><w:sectPr><w:pgMar w:top="720"/></w:sectPr>'
        "</w:pPr></w:p>"
    )
    layout_only = (
        '<w:p><w:pPr><w:sectPr><w:type w:val="continuous"/>'
        '<w:pgMar w:header="0" w:footer="0" w:top="0" w:bottom="0"'
        ' w:left="0" w:right="0"/></w:sectPr></w:pPr></w:p>'
    )
    body = (
        _p("one") + sect + _p("two") + layout_only + _p("three")
        + '<w:p><w:pPr><w:sectPr/></w:pPr><w:r><w:t>four</w:t></w:r></w:p>'
        + _p("five")
    )
    res = docx_to_blocks(make_docx(body))
    pages = {b.text: b.page_idx for b in res.blocks}
    assert pages == {"one": 0, "two": 1, "three": 1, "four": 1, "five": 2}
    assert res.n_pages == 3


def test_omml_control_word_boundaries_and_functions():
    from xml.etree import ElementTree as ET
    from rapiddoc_tpu.office.omml import omml_to_latex

    el = ET.fromstring(f"<m:oMath {M}><m:r><m:t>nπx</m:t></m:r></m:oMath>")
    assert omml_to_latex(el) == r"n\pi x"
    func = (
        f"<m:oMath {M}><m:func><m:fName><m:r><m:t>cos</m:t></m:r></m:fName>"
        "<m:e><m:r><m:t>y</m:t></m:r></m:e></m:func></m:oMath>"
    )
    assert omml_to_latex(ET.fromstring(func)) == r"\cos{y}"


NUMBERING_ML = f"""<?xml version="1.0"?>
<w:numbering {W}>
  <w:abstractNum w:abstractNumId="0">
    <w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/></w:lvl>
    <w:lvl w:ilvl="1"><w:numFmt w:val="decimal"/><w:lvlText w:val="%1.%2."/></w:lvl>
  </w:abstractNum>
  <w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>
</w:numbering>"""


def test_multilevel_numbering_uses_per_level_counters():
    # %1.%2. templates pull the parent level's counter, not the current
    # one repeated (reference: docx_converter _format_numbering_value)
    body = (
        _p("top", num=1) + _p("a", num=1, ilvl=1) + _p("b", num=1, ilvl=1)
        + _p("top2", num=1) + _p("c", num=1, ilvl=1)
    )
    res = docx_to_blocks(
        make_docx(body, {"word/numbering.xml": NUMBERING_ML})
    )
    out = _texts(res)
    assert "1.1. a" in out and "1.2. b" in out
    assert "2.1. c" in out  # deeper level resets under the new parent


def test_sdt_wrapped_toc_content_is_kept():
    body = (
        "<w:sdt><w:sdtContent>"
        "<w:p><w:r><w:t>TOC heading</w:t></w:r></w:p>"
        '<w:p><w:hyperlink w:anchor="_Toc1"><w:r><w:t>1.3.</w:t></w:r>'
        "<w:r><w:t>Chapter</w:t></w:r></w:hyperlink></w:p>"
        "</w:sdtContent></w:sdt>" + _p("after")
    )
    res = docx_to_blocks(make_docx(body))
    out = _texts(res)
    assert "TOC heading" in out and "1.3." in out and "after" in out


def test_image_inside_table_cell_is_kept():
    import struct, zlib

    # minimal 1x1 png
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\xff\x00\x00"))
           + chunk(b"IEND", b""))
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxml'
        'formats.org/package/2006/relationships"><Relationship Id="rId5" '
        'Type="image" Target="media/pic.png"/></Relationships>'
    )
    A = "http://schemas.openxmlformats.org/drawingml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    cell_p = (
        f'<w:p><w:r><w:drawing><a:blip xmlns:a="{A}" xmlns:r="{R}" '
        'r:embed="rId5"/></w:drawing></w:r></w:p>'
    )
    body = f"<w:tbl><w:tr><w:tc>{cell_p}</w:tc></w:tr></w:tbl>"
    res = docx_to_blocks(make_docx(body, {
        "word/_rels/document.xml.rels": rels,
        "word/media/pic.png": png,
    }))
    tables = [b.html for b in res.blocks if b.type == "table"]
    assert len(tables) == 1 and '<img src="images/pic.png"/>' in tables[0]
    assert res.images["images/pic.png"] == png
