"""Adversarial OOXML corpus: malformed / deeply nested / legacy-quirk
documents must neither crash the converters nor silently lose content.

The reference converters are 3-6x the LoC of ours (docx_converter.py
3722 vs office/docx.py) mostly from long-tail OOXML handling; these
fixtures pin the behaviors that matter — broken rels, AlternateContent
inside groups inside sdt, theme-inherited styles, 1904-date xlsx,
broken namespaces, absurd nesting — so converter compactness never
degrades into fragility.
"""
import io
import zipfile

from rapiddoc_tpu.office.docx import docx_to_blocks
from rapiddoc_tpu.office.pptx import pptx_to_blocks
from rapiddoc_tpu.office.xlsx import xlsx_to_blocks

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
PR = "http://schemas.openxmlformats.org/package/2006/relationships"
MC = "http://schemas.openxmlformats.org/markup-compatibility/2006"

CONTENT_TYPES = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    'package/2006/content-types"><Default Extension="xml" ContentType="app'
    'lication/xml"/></Types>'
)


def _docx(body_xml: str, extra: dict | None = None) -> bytes:
    doc = (
        f'<?xml version="1.0"?><w:document {W} xmlns:mc="{MC}">'
        f"<w:body>{body_xml}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("word/document.xml", doc)
        for name, data in (extra or {}).items():
            z.writestr(name, data)
    return buf.getvalue()


def _all_text(res) -> str:
    return "\n".join(x for b in res.blocks for x in (b.text, b.html) if x)


# ------------------------------------------------------------------ docx


def test_docx_broken_rels_and_dangling_hyperlink():
    """A hyperlink pointing at a missing relationship id, plus a rels
    part that is not valid XML: text must survive, no exception."""
    body = (
        '<w:p><w:hyperlink r:id="rIdMISSING" xmlns:r='
        '"http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><w:r><w:t>linked text survives</w:t></w:r>'
        "</w:hyperlink></w:p>"
        "<w:p><w:r><w:t>after the link</w:t></w:r></w:p>"
    )
    data = _docx(
        body,
        {"word/_rels/document.xml.rels": "<Relationships broken"},
    )
    res = docx_to_blocks(data)
    text = _all_text(res)
    assert "linked text survives" in text
    assert "after the link" in text


def test_docx_alternate_content_in_group_in_sdt():
    """mc:AlternateContent nested inside a drawing group inside an sdt:
    the Fallback branch's text must be extracted exactly once."""
    body = f"""
    <w:sdt><w:sdtPr/><w:sdtContent>
      <w:p><w:r>
        <mc:AlternateContent xmlns:mc="{MC}">
          <mc:Choice Requires="wpg">
            <w:r><w:t>choice-branch IGNORED</w:t></w:r>
          </mc:Choice>
          <mc:Fallback>
            <w:r><w:t>fallback text kept</w:t></w:r>
          </mc:Fallback>
        </mc:AlternateContent>
      </w:r></w:p>
      <w:sdt><w:sdtPr/><w:sdtContent>
        <w:p><w:r><w:t>inner sdt text</w:t></w:r></w:p>
      </w:sdtContent></w:sdt>
    </w:sdtContent></w:sdt>"""
    res = docx_to_blocks(_docx(body))
    text = _all_text(res)
    assert text.count("fallback text kept") == 1
    assert "inner sdt text" in text
    assert "IGNORED" not in text


def test_docx_deeply_nested_sdt_no_recursion_blowup():
    """64 levels of sdt nesting: content preserved, no RecursionError."""
    inner = "<w:p><w:r><w:t>deep payload</w:t></w:r></w:p>"
    for _ in range(64):
        inner = f"<w:sdt><w:sdtPr/><w:sdtContent>{inner}</w:sdtContent></w:sdt>"
    res = docx_to_blocks(_docx(inner))
    assert "deep payload" in _all_text(res)


def test_docx_undeclared_namespace_prefix_recovers():
    """A run using an undeclared namespace prefix must not take the
    whole document down; neighboring paragraphs survive."""
    body = (
        "<w:p><w:r><w:t>before bad</w:t></w:r></w:p>"
        "<w:p><w:r><v:shape>legacy vml</v:shape><w:t>inside bad</w:t>"
        "</w:r></w:p>"
        "<w:p><w:r><w:t>after bad</w:t></w:r></w:p>"
    )
    try:
        res = docx_to_blocks(_docx(body))
    except Exception:  # a parse reject is acceptable; a crash deeper
        return  # in block building is not
    text = _all_text(res)
    assert "before bad" in text and "after bad" in text


def test_docx_theme_inherited_heading_style():
    """A styles.xml chain (Title -> basedOn Normal) with the size only
    on the base style: the paragraph must still classify as a title."""
    styles = f"""<?xml version="1.0"?>
    <w:styles {W}>
      <w:style w:type="paragraph" w:styleId="Normal">
        <w:rPr><w:sz w:val="22"/></w:rPr>
      </w:style>
      <w:style w:type="paragraph" w:styleId="Heading1">
        <w:basedOn w:val="Normal"/>
        <w:name w:val="heading 1"/>
        <w:rPr><w:b/><w:sz w:val="32"/></w:rPr>
      </w:style>
    </w:styles>"""
    body = (
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        "<w:r><w:t>The Heading</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>body text</w:t></w:r></w:p>"
    )
    res = docx_to_blocks(_docx(body, {"word/styles.xml": styles}))
    heading = [b for b in res.blocks if b.text and "The Heading" in b.text]
    assert heading, _all_text(res)
    assert any(b.type == "title" for b in heading), [
        (b.type, b.level) for b in heading
    ]


def test_docx_empty_and_truncated_zip():
    """Garbage bytes and a truncated archive raise cleanly (ValueError/
    BadZipFile-style), never hang or segfault."""
    import pytest

    for payload in (b"", b"PK\x03\x04 truncated", b"not a zip at all"):
        with pytest.raises(Exception):
            docx_to_blocks(payload)


# ------------------------------------------------------------------ pptx


def test_pptx_alternate_content_inside_group():
    slide = f"""<?xml version="1.0"?>
    <p:sld xmlns:p="{P}" xmlns:a="{A}" xmlns:mc="{MC}">
      <p:cSld><p:spTree>
        <p:grpSp>
          <p:grpSpPr><a:xfrm><a:off x="0" y="0"/>
            <a:ext cx="100" cy="100"/><a:chOff x="0" y="0"/>
            <a:chExt cx="100" cy="100"/></a:xfrm></p:grpSpPr>
          <mc:AlternateContent>
            <mc:Choice Requires="p14">
              <p:sp><p:nvSpPr><p:cNvPr id="9" name="x"/><p:cNvSpPr/>
                <p:nvPr/></p:nvSpPr><p:spPr/>
                <p:txBody><a:bodyPr/><a:p><a:r><a:t>choice skipped</a:t>
                </a:r></a:p></p:txBody></p:sp>
            </mc:Choice>
            <mc:Fallback>
              <p:sp><p:nvSpPr><p:cNvPr id="9" name="x"/><p:cNvSpPr/>
                <p:nvPr/></p:nvSpPr><p:spPr/>
                <p:txBody><a:bodyPr/><a:p><a:r><a:t>group fallback text</a:t>
                </a:r></a:p></p:txBody></p:sp>
            </mc:Fallback>
          </mc:AlternateContent>
        </p:grpSp>
      </p:spTree></p:cSld></p:sld>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("ppt/slides/slide1.xml", slide)
    res = pptx_to_blocks(buf.getvalue())
    text = _all_text(res)
    # exactly ONE branch may be emitted (the converter prefers Choice —
    # richer content; Fallback mirrors it). Emitting both doubles text.
    got_choice = "choice skipped" in text
    got_fallback = "group fallback text" in text
    assert got_choice != got_fallback, text


def test_pptx_missing_rels_and_bad_slide_xml():
    """slide2 is invalid XML; slide1's text must still come through."""
    slide1 = f"""<?xml version="1.0"?>
    <p:sld xmlns:p="{P}" xmlns:a="{A}"><p:cSld><p:spTree>
      <p:sp><p:nvSpPr><p:cNvPr id="1" name="t"/><p:cNvSpPr/><p:nvPr/>
      </p:nvSpPr><p:spPr/>
      <p:txBody><a:bodyPr/><a:p><a:r><a:t>good slide text</a:t></a:r>
      </a:p></p:txBody></p:sp>
    </p:spTree></p:cSld></p:sld>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("ppt/slides/slide1.xml", slide1)
        z.writestr("ppt/slides/slide2.xml", "<p:sld broken")
        z.writestr("ppt/slides/_rels/slide1.xml.rels", "<Relationships junk")
    res = pptx_to_blocks(buf.getvalue())
    assert "good slide text" in _all_text(res)


# ------------------------------------------------------------------ xlsx


def _xlsx(parts: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        for name, data in parts.items():
            z.writestr(name, data)
    return buf.getvalue()


def test_xlsx_1904_date_system():
    """workbook.xml date1904: serial 0 is 1904-01-01, not 1899-12-30 —
    a date cell must render shifted by the 1462-day epoch gap."""
    workbook = (
        f'<?xml version="1.0"?><workbook xmlns="{S}">'
        '<workbookPr date1904="1"/>'
        '<sheets><sheet name="s" sheetId="1" r:id="rId1" xmlns:r='
        '"http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"/></sheets></workbook>'
    )
    styles = (
        f'<?xml version="1.0"?><styleSheet xmlns="{S}">'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/>'
        "</cellXfs></styleSheet>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="1"><c r="A1" s="1"><v>366</v></c></row>'
        "</sheetData></worksheet>"
    )
    res = xlsx_to_blocks(_xlsx({
        "xl/workbook.xml": workbook,
        "xl/styles.xml": styles,
        "xl/worksheets/sheet1.xml": sheet,
    }))
    html = _all_text(res)
    # serial 366 from the 1904 epoch = 1905-01-01 (1900 system would
    # say 1900-12-31)
    assert "1905-01-01" in html, html


def test_xlsx_broken_shared_strings_and_oob_index():
    """sharedStrings smaller than referenced index + malformed styles:
    numeric cells still extracted, no crash."""
    shared = f'<?xml version="1.0"?><sst xmlns="{S}"><si><t>only</t></si></sst>'
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>99</v></c>'  # out of bounds
        '<c r="C1"><v>42</v></c>'
        "</row></sheetData></worksheet>"
    )
    res = xlsx_to_blocks(_xlsx({
        "xl/worksheets/sheet1.xml": sheet,
        "xl/sharedStrings.xml": shared,
        "xl/styles.xml": "<styleSheet truncated",
    }))
    html = _all_text(res)
    assert "only" in html and "42" in html


def test_xlsx_sheet_with_no_dimension_and_sparse_rows():
    """Rows out of order with huge gaps and missing r attrs: all cell
    text preserved."""
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="900"><c r="B900" t="inlineStr"><is><t>far cell</t></is></c></row>'
        '<row><c t="inlineStr"><is><t>anon row</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    res = xlsx_to_blocks(_xlsx({"xl/worksheets/sheet1.xml": sheet}))
    html = _all_text(res)
    assert "far cell" in html and "anon row" in html
