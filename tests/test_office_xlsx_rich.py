"""xlsx inline rich text, cell font styles and hyperlinks
(reference: xlsx_converter _cell_value_to_html/_apply_inline_font_tags)."""
import io
import zipfile

from rapiddoc_tpu.office.xlsx import xlsx_to_blocks

S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PR = "http://schemas.openxmlformats.org/package/2006/relationships"


def _make_xlsx(sheet_xml, shared_xml=None, styles_xml=None, sheet_rels=None):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        if shared_xml:
            z.writestr("xl/sharedStrings.xml", shared_xml)
        if styles_xml:
            z.writestr("xl/styles.xml", styles_xml)
        if sheet_rels:
            z.writestr(
                "xl/worksheets/_rels/sheet1.xml.rels",
                f'<?xml version="1.0"?><Relationships xmlns="{PR}">'
                f"{sheet_rels}</Relationships>",
            )
    return buf.getvalue()


def _html(res) -> str:
    return "\n".join(b.html for b in res.blocks if b.html)


def test_rich_runs_and_plain_shared_strings():
    shared = (
        f'<?xml version="1.0"?><sst xmlns="{S}">'
        "<si><r><rPr><b/></rPr><t>bold</t></r>"
        "<r><t> tail</t></r></si>"
        "<si><t>plain &amp; safe</t></si>"
        '<si><r><rPr><vertAlign val="superscript"/></rPr><t>2</t></r></si>'
        "</sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c>'
        "</row></sheetData></worksheet>"
    )
    html = _html(xlsx_to_blocks(_make_xlsx(sheet, shared_xml=shared)))
    assert "<td><strong>bold</strong> tail</td>" in html
    assert "<td>plain &amp; safe</td>" in html
    assert "<td><sup>2</sup></td>" in html


def test_cell_font_style_and_hyperlink():
    styles = (
        f'<?xml version="1.0"?><styleSheet xmlns="{S}">'
        "<fonts><font/><font><b/></font></fonts>"
        "<cellXfs>"
        '<xf numFmtId="0" fontId="0"/><xf numFmtId="0" fontId="1"/>'
        "</cellXfs></styleSheet>"
    )
    shared = (
        f'<?xml version="1.0"?><sst xmlns="{S}">'
        "<si><t>Header</t></si><si><t>link text</t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{S}" xmlns:r="{R}">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s" s="1"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c></row>'
        "</sheetData>"
        '<hyperlinks><hyperlink ref="B1" r:id="rId1"/></hyperlinks>'
        "</worksheet>"
    )
    rels = (
        '<Relationship Id="rId1" Type="t" '
        'Target="https://x.example/" TargetMode="External"/>'
    )
    html = _html(
        xlsx_to_blocks(
            _make_xlsx(sheet, shared_xml=shared, styles_xml=styles,
                       sheet_rels=rels)
        )
    )
    assert "<td><strong>Header</strong></td>" in html
    assert '<a href="https://x.example/">link text</a>' in html
