"""pptx converter round-4 depth: decorative-picture skipping, bold-size
title promotion, lstStyle bullet fallback (reference:
rapid_doc/model/pptx/pptx_converter.py _should_skip_picture:532,
_promote_slide_text_blocks_to_titles:1706,
_parse_bullet_from_text_body_list_style:2143)."""
import io
import zipfile

from rapiddoc_tpu.office.pptx import pptx_to_blocks

A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PR = "http://schemas.openxmlformats.org/package/2006/relationships"

# 1-inch EMU = 914400; a 10x7.5in slide
SLIDE_W, SLIDE_H = 9144000, 6858000

PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d4944415478da63fcffff3f030005fe02fea72d1fa20000000049454e44"
    "ae426082"
)


def _sp(name, paras, x, y, cx=2000000, cy=500000, lststyle=""):
    return f"""
    <p:sp xmlns:p="{P}" xmlns:a="{A}">
      <p:nvSpPr><p:cNvPr id="1" name="{name}"/><p:cNvSpPr/>
        <p:nvPr/></p:nvSpPr>
      <p:spPr><a:xfrm><a:off x="{x}" y="{y}"/><a:ext cx="{cx}" cy="{cy}"/>
        </a:xfrm></p:spPr>
      <p:txBody><a:bodyPr/>{lststyle}{paras}</p:txBody>
    </p:sp>"""


def _para(text, rpr="", ppr=""):
    return (
        f'<a:p xmlns:a="{A}">{ppr}<a:r>{rpr}<a:t>{text}</a:t></a:r></a:p>'
    )


def _pic(rid, x, y, cx, cy):
    return f"""
    <p:pic xmlns:p="{P}" xmlns:a="{A}" xmlns:r="{R}">
      <p:nvPicPr><p:cNvPr id="5" name="pic"/><p:cNvPicPr/><p:nvPr/>
      </p:nvPicPr>
      <p:blipFill><a:blip r:embed="{rid}"/></p:blipFill>
      <p:spPr><a:xfrm><a:off x="{x}" y="{y}"/><a:ext cx="{cx}" cy="{cy}"/>
        </a:xfrm></p:spPr>
    </p:pic>"""


def _make_pptx(slide_body, slide_rels=""):
    slide = f"""<?xml version="1.0"?>
    <p:sld xmlns:p="{P}" xmlns:a="{A}" xmlns:r="{R}">
      <p:cSld><p:spTree
        xmlns:p="{P}">{slide_body}</p:spTree></p:cSld></p:sld>"""
    pres = f"""<?xml version="1.0"?>
    <p:presentation xmlns:p="{P}" xmlns:r="{R}">
      <p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst>
      <p:sldSz cx="{SLIDE_W}" cy="{SLIDE_H}"/>
    </p:presentation>"""
    pres_rels = f"""<?xml version="1.0"?>
    <Relationships xmlns="{PR}">
      <Relationship Id="rId1" Type="s" Target="slides/slide1.xml"/>
    </Relationships>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("ppt/presentation.xml", pres)
        z.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        z.writestr("ppt/slides/slide1.xml", slide)
        z.writestr(
            "ppt/slides/_rels/slide1.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{PR}">'
            f"{slide_rels}</Relationships>",
        )
        z.writestr("ppt/media/image1.png", PNG)
    return buf.getvalue()


IMAGE_REL = (
    '<Relationship Id="rIdImg" Type="i" Target="../media/image1.png"/>'
)


def _images(out):
    return [b for b in out.blocks if b.type == "image"]


def test_small_picture_dropped_large_kept():
    # a 2% x 2% icon is decorative; a 40% x 40% figure is content
    body = (
        _pic("rIdImg", 0, 0, int(SLIDE_W * 0.02), int(SLIDE_H * 0.02))
        + _pic("rIdImg", 1000000, 1000000,
               int(SLIDE_W * 0.4), int(SLIDE_H * 0.4))
    )
    out = pptx_to_blocks(_make_pptx(body, IMAGE_REL))
    assert len(_images(out)) == 1


def test_background_picture_under_text_dropped():
    # full-slide picture with a text shape drawn over >=10% of it
    body = (
        _pic("rIdImg", 0, 0, SLIDE_W, SLIDE_H)
        + _sp("over", _para("text on top of the background"),
              x=0, y=0, cx=SLIDE_W, cy=int(SLIDE_H * 0.3))
    )
    out = pptx_to_blocks(_make_pptx(body, IMAGE_REL))
    assert _images(out) == []
    assert any("text on top" in b.text for b in out.blocks)


def test_foreground_picture_over_text_kept():
    # same geometry but picture drawn AFTER the text (on top): kept
    body = (
        _sp("under", _para("text underneath"),
            x=0, y=0, cx=SLIDE_W, cy=int(SLIDE_H * 0.3))
        + _pic("rIdImg", 0, 0, SLIDE_W, SLIDE_H)
    )
    out = pptx_to_blocks(_make_pptx(body, IMAGE_REL))
    assert len(_images(out)) == 1


def test_bold_size_title_promotion():
    sz = lambda pt, b="": f'<a:rPr xmlns:a="{A}" sz="{pt * 100}"{b}/>'
    bold = ' b="1"'
    body = (
        _sp("h2", _para("Section Heading", rpr=sz(28, bold)), x=0, y=0)
        + _sp("h3a", _para("Sub A", rpr=sz(24, bold)), x=0, y=600000)
        + _sp("b1", _para("body one", rpr=sz(18)), x=0, y=1200000)
        + _sp("b2", _para("body two", rpr=sz(18)), x=0, y=1800000)
        + _sp("h3b", _para("Sub B", rpr=sz(24, bold)), x=0, y=2400000)
    )
    out = pptx_to_blocks(_make_pptx(body))
    titles = {b.text: b.level for b in out.blocks if b.type == "title"}
    assert titles.get("Section Heading") == 2
    assert titles.get("Sub A") == 3 and titles.get("Sub B") == 3
    texts = [b.text for b in out.blocks if b.type == "text"]
    assert "body one" in texts and "body two" in texts


def test_bold_promotion_requires_margin_over_body():
    # bold block only 2pt above body: too close for a level-2 title
    sz = lambda pt, b="": f'<a:rPr xmlns:a="{A}" sz="{pt * 100}"{b}/>'
    body = (
        _sp("h", _para("Almost Heading", rpr=sz(20, ' b="1"')), x=0, y=0)
        + _sp("b", _para("body text", rpr=sz(18)), x=0, y=600000)
    )
    out = pptx_to_blocks(_make_pptx(body))
    assert not [b for b in out.blocks if b.type == "title"]


def test_lststyle_bullet_fallback():
    lst = (
        f'<a:lstStyle xmlns:a="{A}"><a:lvl1pPr>'
        '<a:buChar char="•"/></a:lvl1pPr></a:lstStyle>'
    )
    body = _sp(
        "lst", _para("first point") + _para("second point"),
        x=0, y=0, lststyle=lst,
    )
    out = pptx_to_blocks(_make_pptx(body))
    text = "\n".join(b.text for b in out.blocks if b.text)
    assert "- first point" in text
    assert "- second point" in text
