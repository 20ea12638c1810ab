"""WMF/EMF vector media -> placeholder raster (reference:
rapid_doc/backend/utils/office_image.py:34-181)."""
import io
import zipfile

from rapiddoc_tpu.office.common import OfficeResult
from rapiddoc_tpu.office.images import (
    is_vector_image_name,
    normalize_office_image,
    vector_placeholder_png,
)


def test_vector_detection():
    assert is_vector_image_name("image1.wmf")
    assert is_vector_image_name("pic.EMF")
    assert is_vector_image_name("x.bin", "image/x-wmf")
    assert is_vector_image_name("x.bin", "application/x-msmetafile; q=1")
    assert not is_vector_image_name("photo.png")
    assert not is_vector_image_name("photo.jpeg", "image/jpeg")


def test_placeholder_is_valid_png():
    png = vector_placeholder_png()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decodable by the repo's own PNG-capable consumers: quick structural
    # check via zlib round-trip of the IDAT payload
    import struct
    import zlib

    pos, idat = 8, b""
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == 180 * (320 + 1)  # h rows of (filter byte + w px)


def test_normalize_replaces_vector_keeps_raster():
    name, data = normalize_office_image("diagram.emf", b"\x01\x02")
    assert name == "diagram.png" and data[:8] == b"\x89PNG\r\n\x1a\n"
    keep = (b"\x89PNG\r\n\x1a\n" + b"x" * 16)
    assert normalize_office_image("p.png", keep) == ("p.png", keep)


def test_office_result_substitutes_placeholder():
    r = OfficeResult()
    r.add_image("chart.wmf", b"\xd7\xcd\xc6\x9a rest-of-wmf")
    assert "images/chart.png" in r.images
    assert r.images["images/chart.png"][:8] == b"\x89PNG\r\n\x1a\n"
    assert r.blocks[-1].image_name == "images/chart.png"


def _docx_with_media(media_name: str, media: bytes) -> bytes:
    """Minimal docx: one paragraph embedding one image."""
    doc = f"""<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"
 xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <w:body><w:p><w:r><w:drawing>
   <a:blip r:embed="rId9"/>
 </w:drawing></w:r></w:p></w:body></w:document>"""
    rels = f"""<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId9"
  Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image"
  Target="media/{media_name}"/>
</Relationships>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
        z.writestr("word/_rels/document.xml.rels", rels)
        z.writestr(f"word/media/{media_name}", media)
        z.writestr("[Content_Types].xml", "<Types/>")
    return buf.getvalue()


def test_docx_emf_media_becomes_placeholder():
    from rapiddoc_tpu.office.docx import docx_to_blocks

    result = docx_to_blocks(_docx_with_media("image1.emf", b"\x01\x00\x00\x00emf"))
    names = list(result.images)
    assert names == ["images/image1.png"]
    assert result.images[names[0]][:8] == b"\x89PNG\r\n\x1a\n"
