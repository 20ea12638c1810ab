"""Minimal JBIG2 encoder (test oracle for rapiddoc_tpu.pdfio.jbig2).

Implements the encoder side of T.88 — MQ coder (E.3), integer (A.2) and
symbol-ID (A.3) encoding, generic region coding (6.2) and the segment/
stream layout for page info + generic region + symbol dictionary + text
region — enough to round-trip arbitrary bitmaps through the decoder.
Nothing here ships in the package; it exists so the decoder is tested
against independently-generated streams rather than its own output.
"""
from __future__ import annotations

import struct

import numpy as np

from rapiddoc_tpu.pdfio.jbig2 import (
    CODING_TEMPLATES,
    QE_TABLE,
    REFINE_CODING,
    REFINE_REFERENCE,
    TPGDON_CTX,
    _sorted_template,
)


class MQEncoder:
    """T.88 E.3 software-conventions MQ encoder."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0x00])  # carry sentinel

    # -- plumbing ---------------------------------------------------------

    def _byteout(self):
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] += 1  # carry
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def encode(self, bit: int, cx: np.ndarray, idx: int):
        state = int(cx[idx])
        icx = state >> 1
        mps = state & 1
        qe, nmps, nlps, switch = QE_TABLE[icx]
        if bit == mps:
            self.a -= qe
            if not (self.a & 0x8000):
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                cx[idx] = (nmps << 1) | mps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps ^= 1
            cx[idx] = (nlps << 1) | mps
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS per the deployed encoders (openjpeg/jbig2enc): round C
        # up within [C, C+A) — the spec text's round-down variant can
        # land below the interval base and corrupt the last decision
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out[-1] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        # drop the sentinel unless a carry made it significant
        return bytes(self.out[1:] if self.out[0] == 0 else self.out)

    # -- typed helpers ----------------------------------------------------

    def encode_int(self, cx: np.ndarray, value: int | None):
        """A.2 inverse; value None = OOB."""
        prev = 1

        def put(b):
            nonlocal prev
            self.encode(b, cx, prev)
            prev = (
                (prev << 1) | b
                if prev < 256
                else ((((prev << 1) | b) & 511) | 256)
            )

        def put_bits(v, n):
            for i in range(n - 1, -1, -1):
                put((v >> i) & 1)

        if value is None:
            put(1)  # S
            put(0)
            put_bits(0, 2)
            return
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
        put(s)
        if v < 4:
            put(0)
            put_bits(v, 2)
        elif v < 20:
            put(1)
            put(0)
            put_bits(v - 4, 4)
        elif v < 84:
            put(1)
            put(1)
            put(0)
            put_bits(v - 20, 6)
        elif v < 340:
            put(1)
            put(1)
            put(1)
            put(0)
            put_bits(v - 84, 8)
        elif v < 4436:
            put(1)
            put(1)
            put(1)
            put(1)
            put(0)
            put_bits(v - 340, 12)
        else:
            put(1)
            put(1)
            put(1)
            put(1)
            put(1)
            put_bits(v - 4436, 32)

    def encode_iaid(self, cx: np.ndarray, code_len: int, value: int):
        prev = 1
        code = value + (1 << code_len)
        for i in range(code_len - 1, -1, -1):
            b = (code >> i) & 1
            self.encode(b, cx, prev)
            prev = (prev << 1) | b

    def encode_generic(
        self, bitmap: np.ndarray, cx: np.ndarray, template: int,
        at: list[tuple[int, int]], tpgdon: bool = False,
        skip: np.ndarray | None = None,
    ):
        """`skip` (6.6.5.1 HSKIP): pixels where skip!=0 are not coded.
        The caller must pass a bitmap whose skipped pixels are 0 so the
        encoder's contexts match the decoder's (it leaves them 0)."""
        h, w = bitmap.shape
        tpl = _sorted_template(template, at)
        ltp = 0
        for y in range(h):
            if tpgdon:
                typical = int(y > 0 and bool((bitmap[y] == bitmap[y - 1]).all()))
                self.encode(typical ^ ltp, cx, TPGDON_CTX[template])
                ltp = typical
                if ltp:
                    continue
            for x in range(w):
                if skip is not None and skip[y, x]:
                    continue
                ctx = 0
                for dx, dy in tpl:
                    xx, yy = x + dx, y + dy
                    v = (
                        int(bitmap[yy, xx])
                        if 0 <= xx < w and 0 <= yy < h
                        else 0
                    )
                    ctx = (ctx << 1) | v
                self.encode(int(bitmap[y, x]), cx, ctx)

    def encode_refine(
        self, bitmap: np.ndarray, cx: np.ndarray, template: int,
        at: list[tuple[int, int]], ref: np.ndarray, dx: int, dy: int,
    ):
        """6.3 generic refinement coding (TPGRON=0), mirror of
        ArithDecoder.refine."""
        h, w = bitmap.shape
        rh, rw = ref.shape
        coding = list(REFINE_CODING[template])
        reference = list(REFINE_REFERENCE[template])
        if template == 0:
            coding.append(tuple(at[0]))
            reference.append(tuple(at[1]))

        def rpx(x, y):
            return int(ref[y, x]) if 0 <= x < rw and 0 <= y < rh else 0

        for y in range(h):
            for x in range(w):
                rx, ry = x - dx, y - dy
                ctx = 0
                for cdx, cdy in coding:
                    xx, yy = x + cdx, y + cdy
                    v = (
                        int(bitmap[yy, xx])
                        if 0 <= xx < w and 0 <= yy < h
                        else 0
                    )
                    ctx = (ctx << 1) | v
                for rdx, rdy in reference:
                    ctx = (ctx << 1) | rpx(rx + rdx, ry + rdy)
                self.encode(int(bitmap[y, x]), cx, ctx)


def _new_cx(bits: int) -> np.ndarray:
    return np.zeros(1 << bits, np.uint8)


# ----------------------------------------------------------- segments


def segment(number: int, seg_type: int, referred: list[int], page: int,
            data: bytes) -> bytes:
    out = bytearray(struct.pack(">IB", number, seg_type))
    assert len(referred) <= 4
    out.append(len(referred) << 5)
    for r in referred:
        assert r <= 256
        out.append(r)
    out.append(page)
    out += struct.pack(">I", len(data))
    out += data
    return bytes(out)


def page_info(width: int, height: int, default_pixel: int = 0) -> bytes:
    return struct.pack(
        ">IIIIBH", width, height, 0, 0, (default_pixel & 1) << 2, 0
    )


def region_info(w: int, h: int, x: int, y: int, comb_op: int = 0) -> bytes:
    return struct.pack(">IIIIB", w, h, x, y, comb_op)


def generic_region_segment(
    number: int, bitmap: np.ndarray, x: int = 0, y: int = 0,
    template: int = 0, tpgdon: bool = False, comb_op: int = 0,
    page: int = 1,
) -> bytes:
    h, w = bitmap.shape
    at = (
        [(3, -1), (-3, -1), (2, -2), (-2, -2)]
        if template == 0
        else [(3, -1)]
    )
    flags = ((1 if tpgdon else 0) << 3) | (template << 1)
    body = bytearray(region_info(w, h, x, y, comb_op))
    body.append(flags)
    for ax, ay in at:
        body += struct.pack(">bb", ax, ay)
    enc = MQEncoder()
    enc.encode_generic(bitmap, _new_cx(16), template, at, tpgdon)
    body += enc.flush()
    return segment(number, 38, [], page, bytes(body))  # immediate generic


def symbol_dict_segment(
    number: int, symbols: list[np.ndarray], template: int = 0,
    page: int = 1,
) -> bytes:
    """Arithmetic symbol dictionary exporting all symbols, sorted into
    height classes as 6.5.5 requires (ascending height, then width)."""
    order = sorted(
        range(len(symbols)),
        key=lambda i: (symbols[i].shape[0], symbols[i].shape[1]),
    )
    at = (
        [(3, -1), (-3, -1), (2, -2), (-2, -2)]
        if template == 0
        else [(3, -1)]
    )
    flags = template << 10
    body = bytearray(struct.pack(">H", flags))
    for ax, ay in at:
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", len(symbols), len(symbols))
    enc = MQEncoder()
    iadh, iadw, iaex = _new_cx(9), _new_cx(9), _new_cx(9)
    gb_cx = _new_cx(16)
    height = 0
    i = 0
    while i < len(order):
        j = i
        hc_height = symbols[order[i]].shape[0]
        enc.encode_int(iadh, hc_height - height)
        height = hc_height
        width = 0
        while j < len(order) and symbols[order[j]].shape[0] == hc_height:
            sym = symbols[order[j]]
            enc.encode_int(iadw, sym.shape[1] - width)
            width = sym.shape[1]
            enc.encode_generic(sym, gb_cx, template, at, False)
            j += 1
        enc.encode_int(iadw, None)  # OOB ends the height class
        i = j
    enc.encode_int(iaex, 0)  # run of 0 non-exported
    enc.encode_int(iaex, len(symbols))  # export all
    body += enc.flush()
    return segment(number, 0, [], page, bytes(body)), order


def text_region_segment(
    number: int, sym_dict_seg: int, symbols: list[np.ndarray],
    placements: list,  # (symbol_id, x, y[, refined_bitmap]) top-left
    w: int, h: int, x: int = 0, y: int = 0, comb_op: int = 0,
    page: int = 1,
) -> bytes:
    """Arithmetic text region, untransposed, TOPLEFT corner, 1 strip.

    `symbols` is the dictionary's export order; placement ids index it.
    A 4-tuple placement carries a same-size refinement target: the
    instance is coded RI=1 with RDW=RDH=RDX=RDY=0 and an embedded
    refinement of the target against the dictionary symbol."""
    placements = [p if len(p) == 4 else (*p, None) for p in placements]
    refine = any(p[3] is not None for p in placements)
    n_symbols = len(symbols)
    code_len = max(1, (max(n_symbols - 1, 1)).bit_length())
    if n_symbols <= 1:
        code_len = 1
    # REFCORNER = TOPLEFT, SBSTRIPS=1, SBRTEMPLATE=1 when refining
    flags = (1 << 4) | (2 if refine else 0) | ((1 << 15) if refine else 0)
    body = bytearray(region_info(w, h, x, y, comb_op))
    body += struct.pack(">H", flags)
    body += struct.pack(">I", len(placements))
    enc = MQEncoder()
    iadt, iafs, iads = (_new_cx(9) for _ in range(3))
    iari, iardw, iardh, iardx, iardy = (_new_cx(9) for _ in range(5))
    gr_cx = _new_cx(13)
    iaid_cx = _new_cx(code_len + 1)

    def put_instance(sid, target):
        enc.encode_iaid(iaid_cx, code_len, sid)
        if refine:
            enc.encode_int(iari, 1 if target is not None else 0)
            if target is not None:
                for cx9, v in ((iardw, 0), (iardh, 0), (iardx, 0),
                               (iardy, 0)):
                    enc.encode_int(cx9, v)
                enc.encode_refine(
                    target, gr_cx, 1, [], symbols[sid], 0, 0
                )
        sym = target if target is not None else symbols[sid]
        return sym.shape[1]

    # SBSTRIPS=1: every distinct T is its own strip; sort by (t, x)
    placements = sorted(placements, key=lambda p: (p[2], p[1]))
    strip_t = 0
    enc.encode_int(iadt, 0)  # STRIPT init: 0
    i = 0
    firsts = 0
    while i < len(placements):
        t = placements[i][2]
        enc.encode_int(iadt, t - strip_t)
        strip_t = t
        sid, sx, _, target = placements[i]
        enc.encode_int(iafs, sx - firsts)
        firsts = sx
        # decoder draws at CURS then advances CURS += w - 1 (TOPLEFT)
        cur_s = sx + put_instance(sid, target) - 1
        i += 1
        while i < len(placements) and placements[i][2] == t:
            sid2, sx2, _, target2 = placements[i]
            enc.encode_int(iads, sx2 - cur_s)  # IDS (DSOFFSET=0)
            cur_s = sx2 + put_instance(sid2, target2) - 1
            i += 1
        enc.encode_int(iads, None)  # OOB: end of strip
    body += enc.flush()
    return segment(number, 6, [sym_dict_seg], page, bytes(body))


# ------------------------------------------------------ Huffman (B.*)


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def put_bytes(self, data: bytes):
        self.align()
        for b in data:
            self.put(b, 8)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


class HuffmanEnc:
    """Encoder mirror of jbig2.HuffmanTable (same canonical codes)."""

    def __init__(self, lines):
        from rapiddoc_tpu.pdfio.jbig2 import HuffmanTable

        table = HuffmanTable(lines)
        self.by_line = {}  # id(line) -> (length, code)
        for (length, code), ln in table.codes.items():
            self.by_line[ln] = (length, code)
        self.lines = [ln for ln in lines if ln[0] > 0]

    def encode(self, bw: BitWriter, value: int | None):
        if value is None:
            ln = next(l for l in self.lines if l[3] == "oob")
            length, code = self.by_line[ln]
            bw.put(code, length)
            return
        for ln in self.lines:
            plen, rlen, rlow, kind = ln
            if kind == "normal" and rlow <= value < rlow + (1 << rlen):
                length, code = self.by_line[ln]
                bw.put(code, length)
                bw.put(value - rlow, rlen)
                return
            if kind == "lower" and value <= rlow:
                length, code = self.by_line[ln]
                bw.put(code, length)
                bw.put(rlow - value, 32)
                return
            if kind == "upper" and value >= rlow:
                length, code = self.by_line[ln]
                bw.put(code, length)
                bw.put(value - rlow, 32)
                return
        raise ValueError(f"value {value} not encodable")


def _std_enc(n: int) -> HuffmanEnc:
    from rapiddoc_tpu.pdfio.jbig2 import STANDARD_TABLES

    return HuffmanEnc(STANDARD_TABLES[n])


def symbol_dict_segment_huffman(
    number: int, symbols: list[np.ndarray], page: int = 1,
) -> tuple[bytes, list[int]]:
    """SDHUFF=1 dictionary: DH via B.4, DW via B.2, BMSIZE via B.1,
    uncompressed collective bitmaps."""
    order = sorted(
        range(len(symbols)),
        key=lambda i: (symbols[i].shape[0], symbols[i].shape[1]),
    )
    flags = 1  # SDHUFF, selectors 0
    body = bytearray(struct.pack(">H", flags))
    body += struct.pack(">II", len(symbols), len(symbols))
    bw = BitWriter()
    t_dh, t_dw, t_bm, t_ex = _std_enc(4), _std_enc(2), _std_enc(1), _std_enc(1)
    height = 0
    i = 0
    while i < len(order):
        hc = symbols[order[i]].shape[0]
        t_dh.encode(bw, hc - height)
        height = hc
        cls = []
        width = 0
        while i < len(order) and symbols[order[i]].shape[0] == hc:
            sym = symbols[order[i]]
            t_dw.encode(bw, sym.shape[1] - width)
            width = sym.shape[1]
            cls.append(sym)
            i += 1
        t_dw.encode(bw, None)  # OOB
        t_bm.encode(bw, 0)  # uncompressed
        bw.align()
        coll = np.concatenate(cls, axis=1)
        packed = np.packbits(coll, axis=1)
        bw.put_bytes(packed.tobytes())
    t_ex.encode(bw, 0)
    t_ex.encode(bw, len(symbols))
    body += bw.tobytes()
    return segment(number, 0, [], page, bytes(body)), order


def text_region_segment_huffman(
    number: int, sym_dict_seg: int, symbols: list[np.ndarray],
    placements: list,  # (symbol_id, x, y[, refined_bitmap])
    w: int, h: int, x: int = 0, y: int = 0, comb_op: int = 0,
    page: int = 1,
) -> bytes:
    """SBHUFF=1 text region: FS via B.6, DS via B.8, DT via B.11,
    equal-length symbol codes via a single-entry runcode table.

    4-tuple placements carry a same-size refinement target (RI=1,
    RDW/RDH/RDX/RDY=0 via B.15, BMSIZE via B.1, byte-aligned
    arithmetic refinement stream — 6.4.11)."""
    placements = [p if len(p) == 4 else (*p, None) for p in placements]
    refine = any(p[3] is not None for p in placements)
    n = len(symbols)
    code_len = max(1, (n - 1).bit_length()) if n > 1 else 1
    # SBHUFF, REFCORNER=TOPLEFT, SBRTEMPLATE=1 when refining
    flags = 1 | (1 << 4) | (2 if refine else 0) | ((1 << 15) if refine else 0)
    # RDW/RDH/RDX/RDY selectors 1 (B.15), RSIZE selector 0 (B.1)
    hflags = ((1 << 6) | (1 << 8) | (1 << 10) | (1 << 12)) if refine else 0
    body = bytearray(region_info(w, h, x, y, comb_op))
    body += struct.pack(">H", flags)
    body += struct.pack(">H", hflags)
    body += struct.pack(">I", len(placements))
    bw = BitWriter()
    # runcode lengths: runcode `code_len` has prefix length 1, rest 0
    for rc in range(35):
        bw.put(1 if rc == code_len else 0, 4)
    for _ in range(n):  # each symbol's code length, via runcode code_len
        bw.put(0, 1)
    bw.align()
    t_fs, t_ds, t_dt = _std_enc(6), _std_enc(8), _std_enc(11)
    t_rd, t_rsize = _std_enc(15), _std_enc(1)
    gr_cx = _new_cx(13)
    sym_enc = HuffmanEnc(
        [(code_len, 0, i, "normal") for i in range(n)]
    )

    def put_instance(sid, target):
        sym_enc.encode(bw, sid)
        if refine:
            bw.put(1 if target is not None else 0, 1)
            if target is not None:
                for _ in range(4):  # RDW, RDH, RDX, RDY = 0
                    t_rd.encode(bw, 0)
                enc = MQEncoder()
                enc.encode_refine(target, gr_cx, 1, [], symbols[sid], 0, 0)
                data = enc.flush()
                t_rsize.encode(bw, len(data))
                bw.put_bytes(data)  # aligns first
        sym = target if target is not None else symbols[sid]
        return sym.shape[1]

    placements = sorted(placements, key=lambda p: (p[2], p[1]))
    t_dt.encode(bw, 1)  # STRIPT init: strip_t = -1
    strip_t = -1
    firsts = 0
    i = 0
    while i < len(placements):
        t = placements[i][2]
        t_dt.encode(bw, t - strip_t)
        strip_t = t
        sid, sx, _, target = placements[i]
        t_fs.encode(bw, sx - firsts)
        firsts = sx
        cur_s = sx + put_instance(sid, target) - 1
        i += 1
        while i < len(placements) and placements[i][2] == t:
            sid2, sx2, _, target2 = placements[i]
            t_ds.encode(bw, sx2 - cur_s)
            cur_s = sx2 + put_instance(sid2, target2) - 1
            i += 1
        t_ds.encode(bw, None)  # OOB
    body += bw.tobytes()
    return segment(number, 6, [sym_dict_seg], page, bytes(body))


def pattern_dict_segment(
    number: int, patterns: list[np.ndarray], page: int = 1,
) -> bytes:
    """Arithmetic pattern dictionary (6.7), template 0."""
    hdph, hdpw = patterns[0].shape
    coll = np.concatenate(patterns, axis=1)
    body = bytearray([0, hdpw, hdph])
    body += struct.pack(">I", len(patterns) - 1)  # GRAYMAX
    at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
    enc = MQEncoder()
    enc.encode_generic(coll, _new_cx(16), 0, at, False)
    body += enc.flush()
    return segment(number, 16, [], page, bytes(body))


def halftone_region_segment(
    number: int, pat_seg: int, gray: np.ndarray, n_patterns: int,
    pattern_size: int, w: int, h: int, x: int = 0, y: int = 0,
    comb_op: int = 0, page: int = 1, enable_skip: bool = False,
) -> bytes:
    """Arithmetic halftone region, axis-aligned grid of square
    patterns. gray: (HGH, HGW) pattern indices.

    With `enable_skip` (HENABLESKIP, 6.6.5.1) grid cells whose pattern
    falls entirely outside the region are not coded at all."""
    hgh, hgw = gray.shape
    body = bytearray(region_info(w, h, x, y, comb_op))
    # flags: arithmetic, template 0, OR, defpixel 0 (+HENABLESKIP)
    body.append((1 << 3) if enable_skip else 0)
    body += struct.pack(">II", hgw, hgh)
    body += struct.pack(">ii", 0, 0)  # HGX, HGY
    body += struct.pack(">HH", pattern_size << 8, 0)  # HRX, HRY (8.8)
    skip = None
    if enable_skip:
        skip = np.zeros((hgh, hgw), np.uint8)
        for mg in range(hgh):
            for ng in range(hgw):
                px, py = ng * pattern_size, mg * pattern_size
                if (px + pattern_size <= 0 or px >= w
                        or py + pattern_size <= 0 or py >= h):
                    skip[mg, ng] = 1
    bits = max(1, (n_patterns - 1).bit_length()) if n_patterns > 1 else 1
    g = gray.astype(np.int64) ^ (gray.astype(np.int64) >> 1)  # gray code
    if skip is not None:
        g = g * (1 - skip.astype(np.int64))  # decoder leaves them 0
    at = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
    enc = MQEncoder()
    cx = _new_cx(16)
    for i in range(bits):
        plane = ((g >> (bits - 1 - i)) & 1).astype(np.uint8)
        enc.encode_generic(plane, cx, 0, at, False, skip=skip)
    body += enc.flush()
    return segment(number, 22, [pat_seg], page, bytes(body))


def refinement_region_segment(
    number: int, bitmap: np.ndarray, ref: np.ndarray, x: int = 0,
    y: int = 0, comb_op: int = 4, page: int = 1,
) -> bytes:
    """Standalone generic refinement region (7.4.7, type 40): refines
    `ref` (the current page content at x,y) into `bitmap`, composed
    back with REPLACE by default. Template 1, TPGRON=0."""
    h, w = bitmap.shape
    assert ref.shape == (h, w)
    body = bytearray(region_info(w, h, x, y, comb_op))
    body.append(1)  # flags: template 1, no TPGRON
    enc = MQEncoder()
    enc.encode_refine(bitmap, _new_cx(13), 1, [], ref, 0, 0)
    body += enc.flush()
    return segment(number, 40, [], page, bytes(body))


def symbol_dict_segment_refagg(
    number: int, input_dict_seg: int, input_symbols: list[np.ndarray],
    new_specs: list, page: int = 1,
) -> bytes:
    """Arithmetic SDREFAGG=1 dictionary over `input_symbols` (exports
    of `input_dict_seg`). Each spec is either
      ("refine", sid, target)            — REFAGGNINST=1, RDX=RDY=0
      ("agg", [(sid, sx, st), ...], w, h) — REFAGGNINST>1 text region
    Specs must be ordered by ascending target height. Exports all
    (input + new) symbols. SDRTEMPLATE=1."""
    num_new = len(new_specs)
    total = len(input_symbols) + num_new
    code_len = max(1, (max(total - 1, 1)).bit_length())
    if total <= 1:
        code_len = 1
    flags = 2 | (1 << 12)  # SDREFAGG, template 0, SDRTEMPLATE 1
    body = bytearray(struct.pack(">H", flags))
    for ax, ay in [(3, -1), (-3, -1), (2, -2), (-2, -2)]:  # unused GB AT
        body += struct.pack(">bb", ax, ay)
    body += struct.pack(">II", total, num_new)
    enc = MQEncoder()
    iadh, iadw, iaex, iaai = (_new_cx(9) for _ in range(4))
    iardx, iardy = _new_cx(9), _new_cx(9)
    iadt, iafs, iads, iait = (_new_cx(9) for _ in range(4))
    iari, iardw, iardh = (_new_cx(9) for _ in range(3))
    gr_cx = _new_cx(13)
    iaid_cx = _new_cx(code_len + 1)

    def spec_shape(spec):
        if spec[0] == "refine":
            return spec[2].shape
        return (spec[3], spec[2])  # (h, w)

    pool = list(input_symbols)
    height = 0
    i = 0
    while i < num_new:
        hc = spec_shape(new_specs[i])[0]
        enc.encode_int(iadh, hc - height)
        height = hc
        width = 0
        while i < num_new and spec_shape(new_specs[i])[0] == hc:
            spec = new_specs[i]
            sh, sw = spec_shape(spec)
            enc.encode_int(iadw, sw - width)
            width = sw
            if spec[0] == "refine":
                _, sid, target = spec
                enc.encode_int(iaai, 1)
                enc.encode_iaid(iaid_cx, code_len, sid)
                enc.encode_int(iardx, 0)
                enc.encode_int(iardy, 0)
                enc.encode_refine(target, gr_cx, 1, [], pool[sid], 0, 0)
                bmp = target
            else:
                _, places, w_, h_ = spec
                enc.encode_int(iaai, len(places))
                places = sorted(places, key=lambda p: (p[2], p[1]))
                enc.encode_int(iadt, 0)  # STRIPT init
                strip_t = 0
                firsts = 0
                j = 0
                bmp = np.zeros((h_, w_), np.uint8)
                while j < len(places):
                    t = places[j][2]
                    enc.encode_int(iadt, t - strip_t)
                    strip_t = t
                    sid, sx, _ = places[j]
                    enc.encode_int(iafs, sx - firsts)
                    firsts = sx
                    enc.encode_iaid(iaid_cx, code_len, sid)
                    enc.encode_int(iari, 0)
                    sym = pool[sid]
                    bmp[t : t + sym.shape[0], sx : sx + sym.shape[1]] |= sym
                    cur_s = sx + sym.shape[1] - 1
                    j += 1
                    while j < len(places) and places[j][2] == t:
                        sid2, sx2, _ = places[j]
                        enc.encode_int(iads, sx2 - cur_s)
                        enc.encode_iaid(iaid_cx, code_len, sid2)
                        enc.encode_int(iari, 0)
                        sym2 = pool[sid2]
                        bmp[t : t + sym2.shape[0],
                            sx2 : sx2 + sym2.shape[1]] |= sym2
                        cur_s = sx2 + sym2.shape[1] - 1
                        j += 1
                    enc.encode_int(iads, None)
            pool.append(bmp)
            i += 1
        enc.encode_int(iadw, None)  # OOB ends the height class
    enc.encode_int(iaex, 0)
    enc.encode_int(iaex, total)  # export everything
    body += enc.flush()
    return segment(number, 0, [input_dict_seg], page, bytes(body))


def symbol_dict_segment_huffman_refagg(
    number: int, input_dict_seg: int, input_symbols: list[np.ndarray],
    new_specs: list, page: int = 1,
) -> bytes:
    """SDHUFF=1 + SDREFAGG=1 dictionary (same spec format as
    symbol_dict_segment_refagg): DH via B.4, DW via B.2, REFAGGNINST
    via B.1, symbol ids as raw code_len bits, RDX/RDY via B.15,
    BMSIZE via B.1 with byte-aligned arithmetic refinement streams.
    Aggregates use fixed tables B.6/B.8/B.11 and 1-bit RI."""
    num_new = len(new_specs)
    total = len(input_symbols) + num_new
    code_len = max(1, (max(total - 1, 1)).bit_length())
    if total <= 1:
        code_len = 1
    flags = 1 | 2 | (1 << 12)  # SDHUFF, SDREFAGG, SDRTEMPLATE 1
    body = bytearray(struct.pack(">H", flags))
    body += struct.pack(">II", total, num_new)
    bw = BitWriter()
    t_dh, t_dw = _std_enc(4), _std_enc(2)
    t_agg, t_ex, t_rsize = _std_enc(1), _std_enc(1), _std_enc(1)
    t_rd = _std_enc(15)
    t_fs, t_ds, t_dt = _std_enc(6), _std_enc(8), _std_enc(11)
    t_rdwh = _std_enc(15)
    gr_cx = _new_cx(13)

    def put_refine(target, ref):
        enc = MQEncoder()
        enc.encode_refine(target, gr_cx, 1, [], ref, 0, 0)
        data = enc.flush()
        t_rsize.encode(bw, len(data))
        bw.put_bytes(data)  # aligns first

    def spec_shape(spec):
        if spec[0] == "refine":
            return spec[2].shape
        return (spec[3], spec[2])

    pool = list(input_symbols)
    height = 0
    i = 0
    while i < num_new:
        hc = spec_shape(new_specs[i])[0]
        t_dh.encode(bw, hc - height)
        height = hc
        width = 0
        while i < num_new and spec_shape(new_specs[i])[0] == hc:
            spec = new_specs[i]
            sh, sw = spec_shape(spec)
            t_dw.encode(bw, sw - width)
            width = sw
            if spec[0] == "refine":
                _, sid, target = spec
                t_agg.encode(bw, 1)
                bw.put(sid, code_len)
                t_rd.encode(bw, 0)  # RDX
                t_rd.encode(bw, 0)  # RDY
                put_refine(target, pool[sid])
                bmp = target
            else:
                _, places, w_, h_ = spec
                t_agg.encode(bw, len(places))
                places = sorted(places, key=lambda p: (p[2], p[1]))
                t_dt.encode(bw, 1)  # STRIPT init (B.11 has no 0): -1
                strip_t = -1
                firsts = 0
                j = 0
                bmp = np.zeros((h_, w_), np.uint8)
                while j < len(places):
                    t = places[j][2]
                    t_dt.encode(bw, t - strip_t)
                    strip_t = t
                    sid, sx, _ = places[j]
                    t_fs.encode(bw, sx - firsts)
                    firsts = sx
                    bw.put(sid, code_len)
                    bw.put(0, 1)  # RI=0
                    sym = pool[sid]
                    bmp[t : t + sym.shape[0], sx : sx + sym.shape[1]] |= sym
                    cur_s = sx + sym.shape[1] - 1
                    j += 1
                    while j < len(places) and places[j][2] == t:
                        sid2, sx2, _ = places[j]
                        t_ds.encode(bw, sx2 - cur_s)
                        bw.put(sid2, code_len)
                        bw.put(0, 1)
                        sym2 = pool[sid2]
                        bmp[t : t + sym2.shape[0],
                            sx2 : sx2 + sym2.shape[1]] |= sym2
                        cur_s = sx2 + sym2.shape[1] - 1
                        j += 1
                    t_ds.encode(bw, None)
            pool.append(bmp)
            i += 1
        t_dw.encode(bw, None)
    t_ex.encode(bw, 0)
    t_ex.encode(bw, total)
    body += bw.tobytes()
    return segment(number, 0, [input_dict_seg], page, bytes(body))


def g4_encode(bitmap: np.ndarray) -> bytes:
    """MMR (T.6/G4) payload for a bitmap (1 = black) via PIL's TIFF
    writer — strip bytes extracted from the container."""
    import io

    from PIL import Image

    img = Image.fromarray(((1 - bitmap) * 255).astype(np.uint8)).convert(
        "1"
    )
    buf = io.BytesIO()
    img.save(buf, format="TIFF", compression="group4")
    data = buf.getvalue()
    assert data[:2] == b"II"
    ifd = struct.unpack("<I", data[4:8])[0]
    n = struct.unpack("<H", data[ifd : ifd + 2])[0]
    tags = {}
    for i in range(n):
        tag, _, _, v = struct.unpack(
            "<HHII", data[ifd + 2 + i * 12 : ifd + 2 + (i + 1) * 12]
        )
        tags[tag] = v
    return data[tags[273] : tags[273] + tags[279]]


def mmr_generic_region_segment(
    number: int, bitmap: np.ndarray, x: int = 0, y: int = 0,
    comb_op: int = 0, page: int = 1,
) -> bytes:
    h, w = bitmap.shape
    body = bytearray(region_info(w, h, x, y, comb_op))
    body.append(1)  # flags: MMR
    body += g4_encode(bitmap)
    return segment(number, 38, [], page, bytes(body))
