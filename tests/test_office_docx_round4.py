"""docx converter round-4 depth: hidden runs, character-style inheritance,
outline-level headings, TOC -> index blocks, header/footer parts, bookmark
anchors (reference: rapid_doc/model/docx/docx_converter.py
_is_hidden_run:377, _resolve_run_bool_with_inheritance:1977,
_get_effective_outline_level:2217, _is_toc_sdt:2890, _add_index_item:3015,
_add_header_footer:3384)."""
import io
import zipfile

from rapiddoc_tpu.office.docx import docx_to_blocks

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
R = (
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"'
)

CONTENT_TYPES = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    'package/2006/content-types"><Default Extension="xml" ContentType="app'
    'lication/xml"/></Types>'
)

STYLES = f"""<?xml version="1.0"?>
<w:styles {W}>
  <w:style w:type="paragraph" w:styleId="FancyTitle">
    <w:name w:val="Fancy Title"/>
    <w:pPr><w:outlineLvl w:val="1"/></w:pPr>
  </w:style>
  <w:style w:type="paragraph" w:styleId="DerivedTitle">
    <w:name w:val="Derived Title"/>
    <w:basedOn w:val="FancyTitle"/>
  </w:style>
  <w:style w:type="paragraph" w:styleId="TOC1"><w:name w:val="toc 1"/></w:style>
  <w:style w:type="paragraph" w:styleId="TOC2"><w:name w:val="toc 2"/></w:style>
  <w:style w:type="character" w:styleId="BaseStrong">
    <w:name w:val="Base Strong"/>
    <w:rPr><w:b/></w:rPr>
  </w:style>
  <w:style w:type="character" w:styleId="DerivedEm">
    <w:name w:val="Derived Emphasis"/>
    <w:basedOn w:val="BaseStrong"/>
    <w:rPr><w:i/></w:rPr>
  </w:style>
</w:styles>"""


def make_docx(body_xml: str, extra_parts: dict | None = None) -> bytes:
    doc = (
        f'<?xml version="1.0"?><w:document {W} {R}>'
        f"<w:body>{body_xml}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("word/document.xml", doc)
        for name, data in (extra_parts or {}).items():
            z.writestr(name, data)
    return buf.getvalue()


def test_hidden_runs_are_skipped():
    body = (
        "<w:p><w:r><w:t>visible</w:t></w:r>"
        "<w:r><w:rPr><w:vanish/></w:rPr><w:t>ghost</w:t></w:r>"
        '<w:r><w:rPr><w:vanish w:val="0"/></w:rPr><w:t>unhidden</w:t></w:r>'
        "</w:p>"
    )
    md = docx_to_blocks(make_docx(body)).to_markdown()
    assert "visible" in md and "unhidden" in md
    assert "ghost" not in md


def test_character_style_inheritance_bold_italic():
    body = (
        '<w:p><w:r><w:rPr><w:rStyle w:val="DerivedEm"/></w:rPr>'
        "<w:t>styled</w:t></w:r></w:p>"
    )
    md = docx_to_blocks(
        make_docx(body, {"word/styles.xml": STYLES})
    ).to_markdown()
    # bold inherited from the basedOn chain, italic direct on the style
    assert "styled" in md
    assert "**" in md and md.count("*") >= 6  # ***styled***


def test_character_style_off_toggle_beats_inherited_bold():
    body = (
        '<w:p><w:r><w:rPr><w:rStyle w:val="BaseStrong"/>'
        '<w:b w:val="0"/></w:rPr><w:t>plainagain</w:t></w:r></w:p>'
    )
    md = docx_to_blocks(
        make_docx(body, {"word/styles.xml": STYLES})
    ).to_markdown()
    assert "plainagain" in md
    assert "**plainagain**" not in md


def test_outline_level_style_becomes_heading():
    body = (
        '<w:p><w:pPr><w:pStyle w:val="FancyTitle"/></w:pPr>'
        "<w:r><w:t>Outline Heading</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:pStyle w:val="DerivedTitle"/></w:pPr>'
        "<w:r><w:t>Chained Heading</w:t></w:r></w:p>"
    )
    res = docx_to_blocks(make_docx(body, {"word/styles.xml": STYLES}))
    titles = [(b.text, b.level) for b in res.blocks if b.type == "title"]
    assert ("Outline Heading", 2) in titles
    # basedOn chain carries the outline level to the derived style
    assert ("Chained Heading", 2) in titles


def test_toc_sdt_becomes_index_block():
    body = (
        "<w:sdt><w:sdtPr><w:docPartObj>"
        '<w:docPartGallery w:val="Table of Contents"/>'
        "</w:docPartObj></w:sdtPr><w:sdtContent>"
        '<w:p><w:pPr><w:pStyle w:val="TOC1"/></w:pPr>'
        '<w:hyperlink w:anchor="_Toc100"><w:r><w:t>Intro</w:t></w:r>'
        "</w:hyperlink><w:r><w:t>\t3</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:pStyle w:val="TOC2"/></w:pPr>'
        '<w:hyperlink w:anchor="_Toc101"><w:r><w:t>Details</w:t></w:r>'
        "</w:hyperlink><w:r><w:t>\t4</w:t></w:r></w:p>"
        "</w:sdtContent></w:sdt>"
        "<w:p><w:r><w:t>after the toc</w:t></w:r></w:p>"
    )
    res = docx_to_blocks(make_docx(body, {"word/styles.xml": STYLES}))
    idx = [b for b in res.blocks if b.type == "index"]
    assert len(idx) == 1
    items = idx[0].items
    assert "[Intro](#_Toc100) 3" in items[0]
    assert items[1].startswith("    ")  # TOC2 -> one indent level
    assert "[Details](#_Toc101) 4" in items[1]
    md = res.to_markdown()
    assert "[Intro](#_Toc100)" in md and "after the toc" in md
    cl = res.to_content_list()
    index_items = [c for c in cl if c["type"] == "index"]
    assert index_items and len(index_items[0]["list_items"]) == 2


def test_title_bookmark_anchor_in_markdown():
    body = (
        '<w:p><w:pPr><w:pStyle w:val="FancyTitle"/></w:pPr>'
        '<w:bookmarkStart w:id="0" w:name="_Toc100"/>'
        "<w:r><w:t>Intro</w:t></w:r></w:p>"
    )
    md = docx_to_blocks(
        make_docx(body, {"word/styles.xml": STYLES})
    ).to_markdown()
    assert '<a id="_Toc100"></a>' in md
    assert "## Intro" in md


HEADER_PART = f"""<?xml version="1.0"?>
<w:hdr {W}><w:p><w:r><w:t>Journal of Tests</w:t></w:r></w:p></w:hdr>"""
FOOTER_PART = f"""<?xml version="1.0"?>
<w:ftr {W}><w:p><w:r><w:t>7</w:t></w:r></w:p></w:ftr>"""

DOC_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rIdH" Type="h" Target="header1.xml"/>
  <Relationship Id="rIdF" Type="f" Target="footer1.xml"/>
</Relationships>"""


def test_header_footer_parts_extracted_and_discarded_from_markdown():
    body = (
        "<w:p><w:r><w:t>body text</w:t></w:r></w:p>"
        '<w:sectPr><w:headerReference w:type="default" r:id="rIdH"/>'
        '<w:footerReference w:type="default" r:id="rIdF"/></w:sectPr>'
    )
    res = docx_to_blocks(make_docx(body, {
        "word/_rels/document.xml.rels": DOC_RELS,
        "word/header1.xml": HEADER_PART,
        "word/footer1.xml": FOOTER_PART,
    }))
    headers = [b for b in res.blocks if b.type == "header"]
    footers = [b for b in res.blocks if b.type == "footer"]
    assert len(headers) == 1 and headers[0].text == "Journal of Tests"
    assert footers == []  # digit-only footer (page number) dropped
    md = res.to_markdown()
    assert "Journal of Tests" not in md  # discarded from markdown
    cl = res.to_content_list()
    assert any(
        c["type"] == "header" and c["text"] == "Journal of Tests" for c in cl
    )
    middle = res.to_middle_json()
    disc = [
        b for pg in middle["pdf_info"] for b in pg["discarded_blocks"]
    ]
    assert len(disc) == 1 and disc[0]["type"] == "header"


def test_repeated_section_headers_dedupe():
    body = (
        "<w:p><w:r><w:t>page one</w:t></w:r>"
        '<w:pPr><w:sectPr><w:headerReference w:type="default" r:id="rIdH"/>'
        "</w:sectPr></w:pPr></w:p>"
        "<w:p><w:r><w:t>page two</w:t></w:r></w:p>"
        '<w:sectPr><w:headerReference w:type="default" r:id="rIdH"/></w:sectPr>'
    )
    res = docx_to_blocks(make_docx(body, {
        "word/_rels/document.xml.rels": DOC_RELS,
        "word/header1.xml": HEADER_PART,
    }))
    headers = [b for b in res.blocks if b.type == "header"]
    assert len(headers) == 1


NUMBERING = f"""<?xml version="1.0"?>
<w:numbering {W}>
  <w:abstractNum w:abstractNumId="0">
    <w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/><w:lvlText w:val=""/></w:lvl>
  </w:abstractNum>
  <w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>
</w:numbering>"""


def test_lists_are_typed_blocks_with_items():
    """Office lists surface as list blocks with list_items in the content
    list (reference: output_builders.py make_blocks_to_content_list
    BlockType.LIST branch)."""
    body = "".join(
        f'<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/>'
        f"</w:numPr></w:pPr><w:r><w:t>{t}</w:t></w:r></w:p>"
        for t in ("alpha", "beta")
    )
    res = docx_to_blocks(
        make_docx(body, {"word/numbering.xml": NUMBERING})
    )
    lists = [b for b in res.blocks if b.type == "list"]
    assert len(lists) == 1 and lists[0].items == ["- alpha", "- beta"]
    cl = res.to_content_list()
    li = [c for c in cl if c["type"] == "list"]
    assert li and li[0]["list_items"] == ["- alpha", "- beta"]
    assert "- alpha" in res.to_markdown()


def test_seq_field_paragraph_ties_as_caption_without_prefix():
    """A SEQ-field paragraph is a caption even without a Figure/Table
    text prefix (reference: docx_converter._is_caption:3446)."""
    png = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c4"
        "890000000d4944415478da63fcffff3f030005fe02fea72d1fa2000000004945"
        "4e44ae426082"
    )
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rIdP" Type="i" Target="media/image1.png"/>
</Relationships>"""
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    body = (
        f'<w:p><w:r><w:drawing><a:blip xmlns:a="{a}" '
        f'r:embed="rIdP"/></w:drawing></w:r></w:p>'
        '<w:p><w:fldSimple w:instr=" SEQ pic \\* ARABIC "/>'
        "<w:r><w:t>Our system overview</w:t></w:r></w:p>"
    )
    res = docx_to_blocks(make_docx(body, {
        "word/_rels/document.xml.rels": rels,
        "word/media/image1.png": png,
    }))
    caps = [b for b in res.blocks if b.type == "caption"]
    assert len(caps) == 1 and caps[0].text == "Our system overview"
    cl = res.to_content_list()
    img_items = [c for c in cl if c.get("type") == "image"]
    assert img_items and img_items[0].get("img_caption") == [
        "Our system overview"
    ]
    # consumed caption does not also appear as standalone text
    assert not any(
        c.get("type") == "text" and c.get("text") == "Our system overview"
        for c in cl
    )
