"""Encrypted-PDF support: AES/RC4 primitives + empty-user-password
standard security handler fixtures (RC4 R3, AES-128 R4, AES-256 R6)."""
import hashlib
import struct
import zlib

import numpy as np
import pytest

from rapiddoc_tpu.pdfio import crypt as C
from rapiddoc_tpu.pdfio.document import PdfDocument, PdfError

# ---------------------------------------------------------------- primitives


def test_aes_known_answer_fips197():
    # FIPS-197 C.1: AES-128
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = C._aes_encrypt_blocks(key, np.frombuffer(pt, np.uint8)[None])
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    back = C._aes_decrypt_blocks(key, ct)
    assert back.tobytes() == pt
    # FIPS-197 C.3: AES-256
    key = bytes(range(32))
    ct = C._aes_encrypt_blocks(key, np.frombuffer(pt, np.uint8)[None])
    assert ct.tobytes().hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert C._aes_decrypt_blocks(key, ct).tobytes() == pt


def test_rc4_known_vector():
    assert C.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


def test_aes_cbc_roundtrip():
    key = bytes(range(16))
    data = b"the quick brown fox jumps over the lazy dog" * 7
    iv = bytes(range(16, 32))
    enc = C.aes_cbc_encrypt(key, data, iv)
    assert C.aes_cbc_decrypt(key, enc) == data


# ------------------------------------------------------------ fixture builder

FILE_ID = hashlib.md5(b"fixture-id").digest()
CONTENT = zlib.compress(b"q 100 0 0 50 20 700 cm /Im1 Do Q")
IMG = zlib.compress(bytes([200, 30, 60] * 64 * 32))  # 64x32 RGB


def build_pdf(encrypt_dict: bytes | None = None, transform=None) -> bytes:
    """Minimal one-page image PDF; `transform(num, gen, data)` encrypts
    stream payloads."""
    tr = transform or (lambda n, g, d: d)
    img = tr(4, 0, IMG)
    content = tr(5, 0, CONTENT)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >>"
        ),
        4: (
            b"<< /Subtype /Image /Width 64 /Height 32 /BitsPerComponent 8 "
            b"/ColorSpace /DeviceRGB /Filter /FlateDecode /Length "
            + str(len(img)).encode()
            + b" >>\nstream\n" + img + b"\nendstream"
        ),
        5: (
            b"<< /Filter /FlateDecode /Length "
            + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"
        ),
    }
    if encrypt_dict is not None:
        objs[6] = encrypt_dict
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    trailer = b"<< /Size %d /Root 1 0 R /ID [<%s> <%s>]" % (
        n, FILE_ID.hex().encode(), FILE_ID.hex().encode()
    )
    if encrypt_dict is not None:
        trailer += b" /Encrypt 6 0 R"
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF" % xref_at
    return bytes(out)


def _legacy_key(o: bytes, p: int, n: int, r: int) -> bytes:
    h = hashlib.md5()
    h.update(C.PAD)
    h.update(o[:32])
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(FILE_ID)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _make_o_legacy(n: int, r: int) -> bytes:
    """Algorithm 3 with both passwords empty."""
    key = hashlib.md5(C.PAD).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    o = C.rc4(key, C.PAD)
    if r >= 3:
        for i in range(1, 20):
            o = C.rc4(bytes(b ^ i for b in key), o)
    return o


def _make_u_legacy(key: bytes, r: int) -> bytes:
    if r == 2:
        return C.rc4(key, C.PAD)
    x = C.rc4(key, hashlib.md5(C.PAD + FILE_ID).digest())
    for i in range(1, 20):
        x = C.rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16


def _hexstr(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


def _legacy_fixture(r: int, v: int, cfm: str | None) -> bytes:
    p = -3904  # typical permission bits
    n = 16 if v >= 2 else 5
    o = _make_o_legacy(n, r)
    key = _legacy_key(o, p, n, r)
    u = _make_u_legacy(key, r)
    enc = {"V": v, "R": r, "O": o, "U": u, "P": p,
           "Length": n * 8, "EncryptMetadata": True}
    if cfm:
        enc["CF"] = {"StdCF": {"CFM": cfm, "Length": n}}
    handler = C.StandardSecurityHandler(enc, FILE_ID)
    d = b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s" % (
        v, r, n * 8, p, _hexstr(o), _hexstr(u)
    )
    if cfm:
        d += (
            b" /CF << /StdCF << /CFM /" + cfm.encode()
            + b" /Length %d >> >> /StmF /StdCF /StrF /StdCF" % n
        )
    d += b" >>"
    return build_pdf(d, lambda n, g, data: handler.encrypt(data, n, g))


def _r6_fixture() -> bytes:
    file_key = hashlib.sha256(b"file key material").digest()
    vsalt, ksalt = b"VVVVVVVV", b"KKKKKKKK"
    u = C._r6_hash(b"", vsalt) + vsalt + ksalt
    ue = C.aes_cbc_encrypt_nopad(C._r6_hash(b"", ksalt), file_key)
    o = b"\x01" * 48  # owner path unused for empty-user auth
    enc = {"V": 5, "R": 6, "O": o, "U": u, "UE": ue, "P": -3904,
           "Length": 256,
           "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}}}
    handler = C.StandardSecurityHandler(enc, FILE_ID)
    assert handler.key == file_key
    d = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -3904"
        b" /O " + _hexstr(o) + b" /U " + _hexstr(u)
        + b" /UE " + _hexstr(ue) + b" /OE " + _hexstr(b"\x02" * 32)
        + b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
        b" /StmF /StdCF /StrF /StdCF >>"
    )
    return build_pdf(d, lambda n, g, data: handler.encrypt(data, n, g))


def _assert_opens_and_decodes(pdf: bytes):
    doc = PdfDocument(pdf)
    assert len(doc) == 1
    page = doc.get_page(0)
    # content stream decodes through decrypt + flate
    from rapiddoc_tpu.pdfio.cos import Stream

    contents = doc.resolve(page.dict["Contents"])
    assert isinstance(contents, Stream)
    data = doc.stream_bytes(contents)
    assert b"/Im1 Do" in data


def test_plain_fixture_parses():
    _assert_opens_and_decodes(build_pdf())


def test_rc4_r3_empty_password():
    _assert_opens_and_decodes(_legacy_fixture(r=3, v=2, cfm=None))


def test_aesv2_r4_empty_password():
    _assert_opens_and_decodes(_legacy_fixture(r=4, v=4, cfm="AESV2"))


def test_aesv3_r6_empty_password():
    _assert_opens_and_decodes(_r6_fixture())


def test_nonempty_password_raises():
    pdf = _legacy_fixture(r=3, v=2, cfm=None)
    # corrupt /U in place (same length, so offsets stay valid) so the
    # empty-password check fails -> "requires a password" error
    i = pdf.index(b"/U <") + 4
    seg = pdf[i : i + 8]
    repl = bytes(ord("1") if c == ord("0") else ord("0") for c in seg)
    bad = pdf[:i] + repl + pdf[i + 8 :]
    with pytest.raises(PdfError):
        PdfDocument(bad)
