"""txt/ocr classifier: labeled fixtures for every reference signal."""
from pathlib import Path

import numpy as np

from rapiddoc_tpu.pdfio.classify import classify_pdf, sample_page_indices

DEMO1 = Path("/root/reference/demo/pdfs/demo1.pdf")


def make_text_pdf(
    page_texts: list[str],
    media=(0, 0, 612, 792),
    cid_no_tounicode: bool = False,
    tounicode_offset: int | None = None,
) -> bytes:
    """Minimal text PDF. cid_no_tounicode: Type0 font without ToUnicode
    (codes unmappable). tounicode_offset: Type0 font whose ToUnicode maps
    code -> chr(code + offset) (e.g. into U+72xx)."""
    objs: dict[int, bytes] = {}
    n_pages = len(page_texts)
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    next_num = 3 + n_pages
    font_num = next_num
    next_num += 1
    if cid_no_tounicode or tounicode_offset is not None:
        desc_num = next_num
        next_num += 1
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity /DW 1000 >>"
        )
        font = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R]" % desc_num
        )
        if tounicode_offset is not None:
            cmap_num = next_num
            next_num += 1
            cmap = (
                b"/CIDInit /ProcSet findresource begin begincmap\n"
                b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
                b"1 begincidrange\n"
            )
            # map codes 32..126 -> chr(code + offset)
            cmap = (
                b"begincmap\n1 begincodespacerange <0000> <ffff> "
                b"endcodespacerange\n1 beginbfrange\n"
                b"<0020> <007e> <%04x>\nendbfrange\nendcmap"
                % (32 + tounicode_offset)
            )
            objs[cmap_num] = (
                b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
                + b"\nendstream"
            )
            font += b" /ToUnicode %d 0 R" % cmap_num
        font += b" >>"
        objs[font_num] = font
        two_byte = True
    else:
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        two_byte = False
    content_nums = []
    for text in page_texts:
        if two_byte:
            payload = "".join(f"{ord(c):04x}" for c in text).encode()
            shown = b"<" + payload + b">"
        else:
            safe = (
                text.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)")
            )
            shown = b"(" + safe.encode("latin-1", "replace") + b")"
        stream = (
            b"BT /F1 12 Tf 40 700 Td " + shown + b" Tj ET"
        )
        num = next_num
        next_num += 1
        objs[num] = (
            b"<< /Length %d >>\nstream\n" % len(stream) + stream
            + b"\nendstream"
        )
        content_nums.append(num)
    for i, cnum in enumerate(content_nums):
        objs[3 + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [%d %d %d %d] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (*media, font_num, cnum)
        )
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
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (count, xref_at)
    )
    return bytes(out)


LINE = "The quick brown fox jumps over the lazy dog 0123456789. " * 3


def test_sample_indices_spread():
    assert sample_page_indices(3) == [0, 1, 2]
    idx = sample_page_indices(100)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 10


def test_text_pdf_is_txt():
    assert classify_pdf(make_text_pdf([LINE] * 3)) == "txt"


def test_scanned_pdf_is_ocr():
    from PIL import Image

    from rapiddoc_tpu import pdfio

    arr = np.full((400, 300, 3), 255, np.uint8)
    arr[50:150, 40:260] = 30
    assert classify_pdf(pdfio.images_to_pdf([Image.fromarray(arr)])) == "ocr"


def test_extreme_aspect_ratio_is_ocr():
    pdf = make_text_pdf([LINE] * 2, media=(0, 0, 600, 20000))
    assert classify_pdf(pdf) == "ocr"


def test_cid_without_tounicode_is_ocr():
    pdf = make_text_pdf([LINE] * 2, cid_no_tounicode=True)
    assert classify_pdf(pdf) == "ocr"


def test_u72xx_artifacts_is_ocr():
    # ToUnicode maps ASCII codes into U+7280.. -> fake-CJK garbling
    pdf = make_text_pdf([LINE] * 2, tounicode_offset=0x7280 - 32 + 33)
    assert classify_pdf(pdf) == "ocr"


def test_punct_runs_is_ocr():
    garbled = ('()*+,-./:;<=>?@' * 20 + "word ") * 3
    pdf = make_text_pdf([garbled] * 2)
    assert classify_pdf(pdf) == "ocr"


def test_dot_leaders_stay_txt():
    toc = ("Chapter heading " + "." * 40 + " 123  " + LINE) * 2
    pdf = make_text_pdf([toc] * 2)
    assert classify_pdf(pdf) == "txt"


def test_demo_pdf_is_txt():
    if not DEMO1.is_file():
        return
    assert classify_pdf(DEMO1.read_bytes()) == "txt"
