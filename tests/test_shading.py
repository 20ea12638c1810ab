"""Shading/gradient rendering fidelity (pdfio.shading + render hooks).

The reference gets gradient/pattern/clip fidelity from pdfium
(reference: rapid_doc/utils/pdf_image_tools.py:26-48); these pin the
from-scratch implementation: function types 0/2/3/4, axial/radial
shadings, shading+tiling pattern fills, and non-rect clip masks.
"""
from __future__ import annotations

import numpy as np

from rapiddoc_tpu import pdfio
from rapiddoc_tpu.pdfio.render import render_page


def _build_pdf(page_extra: bytes, objs_extra: dict[int, bytes],
               content: bytes, media=(0, 0, 200, 100)) -> bytes:
    """Single-page raw PDF: object 4 = content stream; 5+ = extras."""
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [%d %d %d %d] "
            % media) + page_extra + b" /Contents 4 0 R >>",
        4: (b"<< /Length %d >>\nstream\n" % len(content)) + content
           + b"\nendstream",
    }
    objs.update(objs_extra)
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    count = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % count
    for num in range(1, count):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (count, xref_at))
    return bytes(out)


def _render(data: bytes, dpi: int = 72) -> np.ndarray:
    doc = pdfio.open_pdf(data)
    return np.asarray(render_page(doc.get_page(0), dpi=dpi))


class _StubDoc:
    """Just enough of PdfDocument for direct PdfFunction tests."""

    def resolve(self, x):
        return x

    def stream_bytes(self, s):
        return s.data


class _StubStream:
    def __init__(self, d, data):
        self.dict = d
        self.data = data


# ------------------------------------------------------------- functions


def test_function_type2_exponential():
    from rapiddoc_tpu.pdfio.shading import PdfFunction

    fn = PdfFunction(_StubDoc(), {"FunctionType": 2, "Domain": [0, 1],
                                  "C0": [1.0, 0.0, 0.0],
                                  "C1": [0.0, 0.0, 1.0], "N": 1})
    assert fn(0.0) == [1.0, 0.0, 0.0]
    assert fn(1.0) == [0.0, 0.0, 1.0]
    mid = fn(0.5)
    assert abs(mid[0] - 0.5) < 1e-9 and abs(mid[2] - 0.5) < 1e-9


def test_function_type3_stitching():
    from rapiddoc_tpu.pdfio.shading import PdfFunction

    f1 = {"FunctionType": 2, "C0": [0.0], "C1": [1.0], "N": 1}
    f2 = {"FunctionType": 2, "C0": [1.0], "C1": [0.0], "N": 1}
    fn = PdfFunction(_StubDoc(), {
        "FunctionType": 3, "Domain": [0, 1], "Functions": [f1, f2],
        "Bounds": [0.5], "Encode": [0, 1, 0, 1],
    })
    assert abs(fn(0.25)[0] - 0.5) < 1e-9  # first half ramps up
    assert abs(fn(0.75)[0] - 0.5) < 1e-9  # second half ramps down
    assert fn(0.5)[0] == 1.0


def test_function_type0_sampled():
    from rapiddoc_tpu.pdfio.shading import PdfFunction

    # 3 samples 0, 128, 255 over [0,1] -> ~linear ramp
    st = _StubStream({"FunctionType": 0, "Domain": [0, 1],
                      "Range": [0, 1], "Size": [3],
                      "BitsPerSample": 8}, bytes([0, 128, 255]))
    fn = PdfFunction(_StubDoc(), st)
    assert fn(0.0)[0] == 0.0
    assert abs(fn(1.0)[0] - 1.0) < 1e-9
    assert abs(fn(0.5)[0] - 128 / 255) < 1e-6


def test_function_type4_postscript():
    from rapiddoc_tpu.pdfio.shading import PdfFunction

    st = _StubStream({"FunctionType": 4, "Domain": [0, 1],
                      "Range": [0, 1, 0, 1, 0, 1]},
                     b"{ dup 0.5 mul exch dup 1 exch sub 3 1 roll }")
    fn = PdfFunction(_StubDoc(), st)
    # t=0.8 -> stack manipulations: [0.4, 0.8, 0.2] after roll -> take
    # last 3 as outputs
    out = fn(0.8)
    assert len(out) == 3
    assert any(abs(v - 0.4) < 1e-9 for v in out)
    assert any(abs(v - 0.2) < 1e-9 for v in out)


def test_ps_calculator_control_flow():
    from rapiddoc_tpu.pdfio.shading import _ps_exec, _ps_parse

    prog = _ps_parse("{ dup 0.5 lt { 2 mul } { 0.5 sub } ifelse }")
    assert _ps_exec(prog, [0.25]) == [0.5]
    assert _ps_exec(prog, [0.75]) == [0.25]


# -------------------------------------------------------------- shadings


def _axial_shading_obj() -> bytes:
    return (b"<< /ShadingType 2 /ColorSpace /DeviceRGB "
            b"/Coords [0 0 200 0] /Extend [true true] "
            b"/Function << /FunctionType 2 /Domain [0 1] "
            b"/C0 [1 0 0] /C1 [0 0 1] /N 1 >> >>")


def test_sh_operator_paints_axial_gradient():
    content = b"q 0 0 200 100 re W n /Sh0 sh Q"
    data = _build_pdf(
        b" /Resources << /Shading << /Sh0 5 0 R >> >>",
        {5: _axial_shading_obj()}, content)
    arr = _render(data)
    h, w, _ = arr.shape
    left = arr[h // 2, w // 10].astype(int)
    right = arr[h // 2, w - w // 10].astype(int)
    assert left[0] > 180 and left[2] < 80, left  # red end
    assert right[2] > 180 and right[0] < 80, right  # blue end
    mid = arr[h // 2, w // 2].astype(int)
    assert 60 < mid[0] < 200 and 60 < mid[2] < 200  # blended middle


def test_sh_operator_radial_gradient():
    sh = (b"<< /ShadingType 3 /ColorSpace /DeviceGray "
          b"/Coords [100 50 0 100 50 60] /Extend [false true] "
          b"/Function << /FunctionType 2 /Domain [0 1] "
          b"/C0 [1] /C1 [0] /N 1 >> >>")
    content = b"q 0 0 200 100 re W n /Sh0 sh Q"
    data = _build_pdf(
        b" /Resources << /Shading << /Sh0 5 0 R >> >>", {5: sh}, content)
    arr = np.asarray(_render(data).mean(axis=2))
    h, w = arr.shape
    center = arr[h // 2, w // 2]
    edge = arr[h // 2, 5]
    assert center > 200, center  # white center
    assert edge < 100, edge  # dark rim (extended)


def test_shading_pattern_fills_path():
    """scn with a PatternType-2 pattern paints the shading inside the
    filled path only."""
    pat = (b"<< /PatternType 2 /Matrix [1 0 0 1 0 0] /Shading "
           + _axial_shading_obj() + b" >>")
    # fill the left half rect with the pattern
    content = (b"/Pattern cs /P0 scn 0 0 100 100 re f")
    data = _build_pdf(
        b" /Resources << /Pattern << /P0 5 0 R >> >>", {5: pat}, content)
    arr = _render(data)
    h, w, _ = arr.shape
    inside = arr[h // 2, w // 8].astype(int)
    outside = arr[h // 2, (w * 3) // 4].astype(int)
    assert inside[0] > 150, inside  # red-ish gradient inside the rect
    assert (outside > 240).all(), outside  # untouched background


def test_tiling_pattern_fill():
    """PatternType-1 tile (black dot on transparent) repeats across the
    filled region."""
    tile_content = b"0 0 0 rg 0 0 4 4 re f"
    pat_obj = (b"<< /PatternType 1 /PaintType 1 /TilingType 1 "
               b"/BBox [0 0 10 10] /XStep 10 /YStep 10 "
               b"/Resources << >> /Length %d >>\nstream\n"
               % len(tile_content)) + tile_content + b"\nendstream"
    content = b"/Pattern cs /P0 scn 0 0 200 100 re f"
    data = _build_pdf(
        b" /Resources << /Pattern << /P0 5 0 R >> >>", {5: pat_obj}, content)
    arr = np.asarray(_render(data).mean(axis=2))
    dark = arr < 100
    assert dark.mean() > 0.05, dark.mean()  # dots painted
    assert dark.mean() < 0.6  # ... but not a solid fill
    # repetition: dark columns occur at ~10pt (=10px at 72dpi) period
    col_profile = dark.mean(axis=0)
    dark_cols = np.where(col_profile > 0.2)[0]
    assert len(dark_cols) > 10


# ------------------------------------------------------------ clip masks


def test_nonrect_clip_masks_fill():
    """A triangular clip path restricts a full-page fill to the triangle
    (previously degraded to the clip bbox)."""
    content = (b"q 0 0 m 200 0 l 0 100 l h W n "
               b"0 0 0 rg 0 0 200 100 re f Q")
    data = _build_pdf(b"", {}, content)
    arr = np.asarray(_render(data).mean(axis=2))
    h, w = arr.shape
    # inside triangle (near origin corner = bottom-left in PDF space ->
    # top-left after y-flip... check both): one of the two corners on the
    # hypotenuse side must stay white, the opposite stays black
    black_frac = (arr < 100).mean()
    assert 0.3 < black_frac < 0.7, black_frac  # half the page, not bbox
    # corner opposite the triangle stays background
    assert arr[h - 3, w - 3] > 200 or arr[2, w - 3] > 200


def test_nonrect_clip_masks_image():
    """Images also honor the polygon clip."""
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (50, 50), (0, 0, 0)).save(buf, format="JPEG")
    jpg = buf.getvalue()
    img_obj = (b"<< /Type /XObject /Subtype /Image /Width 50 /Height 50 "
               b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
               b"/Filter /DCTDecode /Length %d >>\nstream\n" % len(jpg)
               ) + jpg + b"\nendstream"
    content = (b"q 0 0 m 200 0 l 0 100 l h W n "
               b"q 200 0 0 100 0 0 cm /Im0 Do Q Q")
    data = _build_pdf(
        b" /Resources << /XObject << /Im0 5 0 R >> >>",
        {5: img_obj}, content)
    arr = np.asarray(_render(data).mean(axis=2))
    h, w = arr.shape
    black_frac = (arr < 100).mean()
    assert 0.3 < black_frac < 0.7, black_frac
    assert arr[h - 3, w - 3] > 200 or arr[2, w - 3] > 200


def test_gradient_background_keeps_text_legible():
    """OCR-path sanity: a page with a soft gradient wash + dark text
    still shows the text darker than its local background."""
    sh = (b"<< /ShadingType 2 /ColorSpace /DeviceGray "
          b"/Coords [0 0 200 0] /Extend [true true] "
          b"/Function << /FunctionType 2 /Domain [0 1] "
          b"/C0 [1] /C1 [0.75] /N 1 >> >>")
    content = (b"q 0 0 200 100 re W n /Sh0 sh Q "
               b"BT /F1 24 Tf 20 40 Td 0 g (Hello) Tj ET")
    data = _build_pdf(
        b" /Resources << /Shading << /Sh0 5 0 R >> /Font "
        b"<< /F1 6 0 R >> >>",
        {5: sh,
         6: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"},
        content)
    arr = np.asarray(_render(data, dpi=144).mean(axis=2))
    # background is a light wash everywhere (>150), text strokes dark
    assert (arr > 150).mean() > 0.7
    assert (arr < 100).mean() > 0.005  # glyph ink present


# ------------------------------------------------- fidelity corpus extras


def test_type3_font_glyphs_render():
    """Type3 glyph CharProcs execute as content streams: a square-glyph
    font must paint ink where the glyphs land (previously Type3 fell to
    the unicode fallback and symbolic glyphs vanished)."""
    charproc = b"0 0 700 700 re f"
    objs = {
        5: (b"<< /Type /Font /Subtype /Type3 "
            b"/FontBBox [0 0 800 800] "
            b"/FontMatrix [0.001 0 0 0.001 0 0] "
            b"/CharProcs << /sq 6 0 R >> "
            b"/Encoding << /Differences [65 /sq] >> "
            b"/FirstChar 65 /LastChar 65 /Widths [800] >>"),
        6: (b"<< /Length %d >>\nstream\n" % len(charproc)) + charproc
           + b"\nendstream",
    }
    content = b"BT /F3 36 Tf 40 30 Td (AAA) Tj ET"
    data = _build_pdf(
        b" /Resources << /Font << /F3 5 0 R >> >>", objs, content)
    arr = np.asarray(_render(data).mean(axis=2))
    dark = arr < 100
    assert dark.mean() > 0.05, dark.mean()  # three squares of ink
    # squares sit on the baseline row band, not everywhere
    assert dark.mean() < 0.5


def test_rotated_text_renders_ink():
    """Text under a rotation matrix still rasterizes (fidelity corpus:
    rotated labels/stamps)."""
    # 30-degree rotation: cos=0.866, sin=0.5
    content = (b"BT /F1 24 Tf 0.866 0.5 -0.5 0.866 60 20 Tm "
               b"(Rotated stamp text) Tj ET")
    data = _build_pdf(
        b" /Resources << /Font << /F1 5 0 R >> >>",
        {5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"},
        content)
    arr = np.asarray(_render(data, dpi=144).mean(axis=2))
    assert (arr < 100).mean() > 0.005


def test_watermark_form_with_alpha_keeps_text_legible():
    """A translucent watermark form (ExtGState ca) drawn over body text
    must not blot the text out (fidelity corpus: watermarked pages)."""
    wm = b"/GS0 gs 0.2 0.2 0.9 rg 0 0 200 100 re f"
    objs = {
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: (b"<< /Type /XObject /Subtype /Form /BBox [0 0 200 100] "
            b"/Resources << /ExtGState << /GS0 7 0 R >> >> "
            b"/Length %d >>\nstream\n" % len(wm)) + wm + b"\nendstream",
        7: b"<< /Type /ExtGState /ca 0.15 >>",
    }
    content = (b"BT /F1 20 Tf 20 40 Td (Body text under watermark) Tj ET "
               b"q /Wm Do Q")
    data = _build_pdf(
        b" /Resources << /Font << /F1 5 0 R >> /XObject "
        b"<< /Wm 6 0 R >> >>", objs, content)
    arr = np.asarray(_render(data, dpi=144).mean(axis=2))
    # wash is light (alpha 0.15 over white stays bright)...
    assert (arr > 150).mean() > 0.6
    # ...and glyph ink remains dark under it
    assert (arr < 100).mean() > 0.005
