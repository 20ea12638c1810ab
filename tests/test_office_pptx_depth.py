"""pptx converter depth: grouped shapes (transformed), bullets,
line breaks, hyperlinks (reference pptx_converter.py behaviors)."""
import io
import zipfile

from rapiddoc_tpu.office.pptx import pptx_to_blocks

A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PR = "http://schemas.openxmlformats.org/package/2006/relationships"


def _sp(name, text_xml, x, y, cx=100, cy=50, ph=""):
    return f"""
    <p:sp xmlns:p="{P}" xmlns:a="{A}">
      <p:nvSpPr><p:cNvPr id="1" name="{name}"/><p:cNvSpPr/>
        <p:nvPr>{ph}</p:nvPr></p:nvSpPr>
      <p:spPr><a:xfrm><a:off x="{x}" y="{y}"/><a:ext cx="{cx}" cy="{cy}"/>
        </a:xfrm></p:spPr>
      <p:txBody><a:bodyPr/>{text_xml}</p:txBody>
    </p:sp>"""


def _para(text, ppr=""):
    return f'<a:p xmlns:a="{A}">{ppr}<a:r><a:t>{text}</a:t></a:r></a:p>'


def _make_pptx(slide_body, slide_rels=""):
    slide = f"""<?xml version="1.0"?>
    <p:sld xmlns:p="{P}" xmlns:a="{A}" xmlns:r="{R}">
      <p:cSld><p:spTree
        xmlns:p="{P}">{slide_body}</p:spTree></p:cSld></p:sld>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("ppt/slides/slide1.xml", slide)
        z.writestr(
            "ppt/slides/_rels/slide1.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{PR}">'
            f"{slide_rels}</Relationships>",
        )
    return buf.getvalue()


def test_grouped_shapes_recursed_with_transform():
    # group box at (0, 1000)..(2000x1000), child space 0..(200x100):
    # child at chX=100 maps to slide x=1000 — AFTER an ungrouped shape
    # at x=0,y=1000 in reading order
    inner = _sp("in-group", _para("grouped text"), x=100, y=10,
                cx=50, cy=50)
    grp = f"""
    <p:grpSp xmlns:p="{P}" xmlns:a="{A}">
      <p:nvGrpSpPr><p:cNvPr id="9" name="g"/><p:cNvGrpSpPr/><p:nvPr/>
      </p:nvGrpSpPr>
      <p:grpSpPr><a:xfrm>
        <a:off x="0" y="1000"/><a:ext cx="2000" cy="1000"/>
        <a:chOff x="0" y="0"/><a:chExt cx="200" cy="100"/>
      </a:xfrm></p:grpSpPr>
      {inner}
    </p:grpSp>"""
    first = _sp("plain", _para("left text"), x=0, y=1000, cx=400, cy="900")
    out = pptx_to_blocks(_make_pptx(first + grp))
    md = "\n".join(b.text for b in out.blocks if b.text)
    assert "grouped text" in md
    assert md.index("left text") < md.index("grouped text")


def test_bullets_and_autonum():
    ppr_bullet = f'<a:pPr xmlns:a="{A}"><a:buChar char="•"/></a:pPr>'
    ppr_auto = f'<a:pPr xmlns:a="{A}"><a:buAutoNum type="arabicPeriod"/></a:pPr>'
    ppr_lvl1 = (
        f'<a:pPr xmlns:a="{A}" lvl="1"><a:buChar char="•"/></a:pPr>'
    )
    body = _sp(
        "list",
        _para("alpha", ppr_bullet)
        + _para("nested", ppr_lvl1)
        + _para("one", ppr_auto)
        + _para("two", ppr_auto),
        x=0, y=0,
    )
    out = pptx_to_blocks(_make_pptx(body))
    text = "\n".join(b.text for b in out.blocks if b.text)
    assert "- alpha" in text
    assert "  - nested" in text
    assert "1. one" in text
    assert "2. two" in text


def test_break_and_hyperlink():
    para = (
        f'<a:p xmlns:a="{A}"><a:r><a:t>before</a:t></a:r><a:br/>'
        f'<a:r><a:rPr><a:hlinkClick xmlns:r="{R}" r:id="rId7"/></a:rPr>'
        f"<a:t>click</a:t></a:r></a:p>"
    )
    rels = (
        f'<Relationship Id="rId7" Type="t" '
        f'Target="https://example.com/x" TargetMode="External"/>'
    )
    out = pptx_to_blocks(_make_pptx(_sp("s", para, x=0, y=0), rels))
    text = "\n".join(b.text for b in out.blocks if b.text)
    assert "before\n" in text
    assert "[click](https://example.com/x)" in text


def test_slide_notes_appended():
    slide_rels = (
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/notesSlide" '
        'Target="../notesSlides/notesSlide1.xml"/>'
    )
    notes = f"""<?xml version="1.0"?>
    <p:notes xmlns:p="{P}" xmlns:a="{A}">
      <p:cSld><p:spTree>
        {_sp("num", _para("3"), x=0, y=0,
             ph='<p:ph type="sldNum"/>')}
        {_sp("body", _para("speaker note here"), x=0, y=100)}
      </p:spTree></p:cSld></p:notes>"""
    body = _sp("s", _para("slide body"), x=0, y=0)
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO(_make_pptx(body, slide_rels))
    data = buf.getvalue()
    # rebuild zip with the notes part added
    out_buf = _io.BytesIO()
    with _zf.ZipFile(_io.BytesIO(data)) as zin, _zf.ZipFile(out_buf, "w") as zout:
        for n in zin.namelist():
            zout.writestr(n, zin.read(n))
        zout.writestr("ppt/notesSlides/notesSlide1.xml", notes)
    out = pptx_to_blocks(out_buf.getvalue())
    text = "\n".join(b.text for b in out.blocks if b.text)
    assert "slide body" in text
    assert "speaker note here" in text
    assert text.index("slide body") < text.index("speaker note here")
    assert "\n3" not in text  # sldNum placeholder skipped


def test_inline_rich_text_styles():
    """a:rPr b/i/u/strike/baseline render as markdown(+HTML) wrappers;
    adjacent same-style runs merge (reference office_rich_text.py)."""
    para = (
        f'<a:p xmlns:a="{A}">'
        '<a:r><a:rPr b="1"/><a:t>bo</a:t></a:r>'
        '<a:r><a:rPr b="1"/><a:t>ld</a:t></a:r>'
        "<a:r><a:t> plain </a:t></a:r>"
        '<a:r><a:rPr i="1"/><a:t>it</a:t></a:r>'
        '<a:r><a:rPr b="1" i="1"/><a:t>both</a:t></a:r>'
        '<a:r><a:rPr strike="sngStrike"/><a:t>gone</a:t></a:r>'
        '<a:r><a:rPr u="sng"/><a:t>under</a:t></a:r>'
        '<a:r><a:rPr baseline="30000"/><a:t>2</a:t></a:r>'
        '<a:r><a:rPr baseline="-25000"/><a:t>n</a:t></a:r>'
        "</a:p>"
    )
    res = pptx_to_blocks(_make_pptx(_sp("Text", para, 0, 0)))
    text = "\n".join(b.text for b in res.blocks if b.text)
    assert "**bold**" in text
    assert "plain" in text
    assert "*it*" in text and "***both***" in text
    assert "~~gone~~" in text and "<u>under</u>" in text
    assert "<sup>2</sup>" in text and "<sub>n</sub>" in text


def test_styled_hyperlink_run():
    rid = "rId9"
    para = (
        f'<a:p xmlns:a="{A}" xmlns:r="{R}">'
        f'<a:r><a:rPr b="1"><a:hlinkClick r:id="{rid}"/></a:rPr>'
        "<a:t>click</a:t></a:r></a:p>"
    )
    rels = (
        f'<Relationship Id="{rid}" Type="t" Target="https://x.example/"'
        ' TargetMode="External"/>'
    )
    res = pptx_to_blocks(_make_pptx(_sp("T", para, 0, 0), rels))
    text = "\n".join(b.text for b in res.blocks if b.text)
    assert "[**click**](https://x.example/)" in text


def test_alternate_content_choice_shape_with_inline_math():
    # shapes inside mc:AlternateContent/mc:Choice must not be dropped,
    # and a14:m-wrapped OMML renders inline as $latex$
    MC = "http://schemas.openxmlformats.org/markup-compatibility/2006"
    MNS = "http://schemas.openxmlformats.org/officeDocument/2006/math"
    para = (
        f'<a:p xmlns:a="{A}"><a:r><a:t>before </a:t></a:r>'
        f'<a14:m xmlns:a14="http://schemas.microsoft.com/office/drawing/2010/main">'
        f'<m:oMath xmlns:m="{MNS}"><m:r><m:t>x+y</m:t></m:r></m:oMath>'
        "</a14:m>"
        "<a:r><a:t> after</a:t></a:r></a:p>"
    )
    body = (
        f'<mc:AlternateContent xmlns:mc="{MC}"><mc:Choice Requires="a14">'
        + _sp("T", para, 0, 0)
        + "</mc:Choice><mc:Fallback/></mc:AlternateContent>"
    )
    res = pptx_to_blocks(_make_pptx(body))
    text = "\n".join(b.text for b in res.blocks if b.text)
    assert "before $x+y$ after" in text
