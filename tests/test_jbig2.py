"""JBIG2 decoder tests: round trips against the independent test
encoder (tests/jbig2_encoder.py) plus native-vs-python parity."""
import numpy as np
import pytest

from rapiddoc_tpu.pdfio import jbig2 as J

import jbig2_encoder as E


def _random_bitmap(rng, h, w, density=0.3):
    bmp = (rng.random((h, w)) < density).astype(np.uint8)
    # text-ish structure: a few runs
    for _ in range(4):
        y = rng.integers(0, h)
        x0 = rng.integers(0, w)
        bmp[y, x0 : x0 + rng.integers(1, w)] = 1
    return bmp


@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_generic_region_roundtrip(template):
    rng = np.random.default_rng(template)
    bmp = _random_bitmap(rng, 40, 61)
    stream = E.segment(1, 48, [], 1, E.page_info(61, 40)) + \
        E.generic_region_segment(2, bmp, template=template)
    out = J.decode(stream)
    np.testing.assert_array_equal(out, bmp)


def test_generic_region_tpgdon():
    rng = np.random.default_rng(7)
    bmp = _random_bitmap(rng, 30, 50)
    bmp[10:20] = bmp[10]  # repeated rows exercise typical prediction
    stream = E.segment(1, 48, [], 1, E.page_info(50, 30)) + \
        E.generic_region_segment(2, bmp, template=0, tpgdon=True)
    out = J.decode(stream)
    np.testing.assert_array_equal(out, bmp)


def test_generic_region_python_fallback_matches():
    """The pure-Python MQ mirror decodes identically to the native
    kernels (same stream, same contexts)."""
    rng = np.random.default_rng(3)
    bmp = _random_bitmap(rng, 16, 23)
    at = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
    enc = E.MQEncoder()
    enc.encode_generic(bmp, E._new_cx(16), 0, at, False)
    data = enc.flush()
    d_native = J.ArithDecoder(data)
    d_py = J.ArithDecoder(data, force_python=True)
    out_native = d_native.generic(J.new_context(16), 0, False, at, 23, 16)
    out_py = d_py.generic(J.new_context(16), 0, False, at, 23, 16)
    np.testing.assert_array_equal(out_native, out_py)
    np.testing.assert_array_equal(out_native, bmp)


def test_integer_roundtrip():
    values = [0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
              100000, -4436, -75, None, 7]
    enc = E.MQEncoder()
    cx = E._new_cx(9)
    for v in values:
        enc.encode_int(cx, v)
    data = enc.flush()
    for force_py in (False, True):
        dec = J.ArithDecoder(data, force_python=force_py)
        dcx = J.new_context(9)
        got = [dec.integer(dcx) for _ in values]
        assert got == values


def test_symbol_dict_and_text_region():
    """Symbols decode from the dictionary and place via the text region
    exactly where the encoder put them."""
    rng = np.random.default_rng(11)
    glyph_a = np.zeros((8, 6), np.uint8)
    glyph_a[1:7, 1:5] = 1
    glyph_a[3, 2:4] = 0
    glyph_b = (rng.random((8, 5)) < 0.5).astype(np.uint8)
    glyph_b[0, 0] = 1
    glyph_c = np.ones((5, 4), np.uint8)

    symbols = [glyph_a, glyph_b, glyph_c]
    sd_seg, order = E.symbol_dict_segment(2, symbols)
    export = [symbols[i] for i in order]

    W, H = 64, 32
    placements = [(0, 2, 3), (1, 20, 3), (2, 40, 3), (1, 5, 18)]
    tr_seg = E.text_region_segment(3, 2, export, placements, W, H)
    stream = E.segment(1, 48, [], 1, E.page_info(W, H)) + sd_seg + tr_seg

    out = J.decode(stream)
    expect = np.zeros((H, W), np.uint8)
    for sid, x, y in placements:
        sym = export[sid]
        expect[y : y + sym.shape[0], x : x + sym.shape[1]] |= sym
    np.testing.assert_array_equal(out, expect)


def test_composition_ops():
    """XOR composition of two overlapping generic regions."""
    a = np.ones((10, 10), np.uint8)
    b = np.ones((10, 10), np.uint8)
    stream = (
        E.segment(1, 48, [], 1, E.page_info(20, 10))
        + E.generic_region_segment(2, a, x=0, y=0, comb_op=0)
        + E.generic_region_segment(3, b, x=5, y=0, comb_op=2)  # XOR
    )
    out = J.decode(stream)
    assert out[:, :5].all()          # only a
    assert not out[:, 5:10].any()    # overlap cancels
    assert out[:, 10:15].all()       # only b
    assert not out[:, 15:].any()


def test_pdf_image_integration(tmp_path):
    """A JBIG2Decode image inside a synthesized PDF object decodes
    through xobject_to_pil."""
    from rapiddoc_tpu.pdfio.cos import Stream
    from rapiddoc_tpu.pdfio.images import xobject_to_pil

    rng = np.random.default_rng(5)
    bmp = _random_bitmap(rng, 24, 33)
    payload = E.segment(1, 48, [], 1, E.page_info(33, 24)) + \
        E.generic_region_segment(2, bmp)
    stream = Stream(
        {
            "Type": "XObject", "Subtype": "Image", "Width": 33,
            "Height": 24, "BitsPerComponent": 1,
            "ColorSpace": "DeviceGray", "Filter": "JBIG2Decode",
        },
        payload,
    )

    class _Doc:
        @staticmethod
        def resolve(x):
            return x

    img = xobject_to_pil(_Doc(), stream)
    assert img is not None
    arr = np.asarray(img.convert("L"))
    np.testing.assert_array_equal(arr == 0, bmp.astype(bool))


def test_huffman_standard_tables():
    """Every standard table round-trips representative values through
    the independent encoder mirror (prefix assignment + range lines +
    lower/upper/OOB)."""
    from rapiddoc_tpu.pdfio.jbig2 import (
        BitReader,
        STANDARD_TABLES,
        standard_table,
    )

    cases = {
        1: [0, 15, 16, 271, 272, 65807, 65808, 1000000],
        2: [0, 1, 2, 3, 10, 11, 74, 75, 200, None],
        3: [-256, -1, 0, 11, 74, 75, 200, -257, -5000, None],
        4: [1, 2, 3, 4, 11, 12, 75, 76, 500],
        5: [-255, -1, 1, 12, 75, 76, 500, -256, -999],
        6: [-2048, -1024, -512, -256, -128, -64, -32, 0, 127, 128, 255,
            256, 511, 512, 1023, 1024, 2047, 2048, 9999, -2049, -9999],
        7: [-1024, -512, -256, -128, -64, -32, 0, 31, 32, 63, 64, 127,
            128, 255, 256, 511, 512, 1023, 1024, 2047, 2048, -1025],
        8: [-15, -7, -5, -3, -2, -1, 0, 1, 2, 3, 4, 19, 20, 21, 22, 37,
            38, 69, 70, 133, 134, 261, 262, 389, 390, 645, 646, 1669,
            1670, -16, None],
        9: [-31, -15, -11, -7, -5, -3, -1, 1, 3, 5, 7, 38, 39, 43, 75,
            139, 267, 523, 779, 1291, 3338, 3339, -32, None],
        10: [-21, -5, -4, -3, -2, 1, 2, 3, 4, 5, 6, 69, 70, 102, 134,
             198, 326, 582, 1094, 2118, 4165, 4166, -22, None],
        11: [1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 16, 17, 20, 21, 28, 29,
             44, 45, 76, 77, 140, 141, 999],
        12: [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16, 17, 24, 25,
             40, 41, 72, 73, 999],
        13: [1, 2, 3, 4, 5, 6, 7, 14, 15, 16, 17, 20, 21, 28, 29, 44,
             45, 76, 77, 140, 141, 999],
        14: [-2, -1, 0, 1, 2],
        15: [-24, -9, -8, -4, -2, -1, 0, 1, 2, 3, 4, 5, 8, 9, 24, 25,
             99, -25, -99],
    }
    import jbig2_encoder as E2

    for n, values in cases.items():
        enc = E2.HuffmanEnc(STANDARD_TABLES[n])
        bw = E2.BitWriter()
        for v in values:
            enc.encode(bw, v)
        br = BitReader(bw.tobytes())
        table = standard_table(n)
        got = [table.decode(br) for _ in values]
        assert got == values, f"table B.{n}: {got} != {values}"


def test_huffman_symbol_dict_and_text_region():
    rng = np.random.default_rng(21)
    glyph_a = np.zeros((8, 6), np.uint8)
    glyph_a[1:7, 1:5] = 1
    glyph_b = (rng.random((8, 5)) < 0.5).astype(np.uint8)
    glyph_c = np.ones((5, 4), np.uint8)
    symbols = [glyph_a, glyph_b, glyph_c]
    sd_seg, order = E.symbol_dict_segment_huffman(2, symbols)
    export = [symbols[i] for i in order]

    W, H = 64, 32
    placements = [(0, 2, 3), (1, 20, 3), (2, 40, 3), (1, 5, 18)]
    tr_seg = E.text_region_segment_huffman(3, 2, export, placements, W, H)
    stream = E.segment(1, 48, [], 1, E.page_info(W, H)) + sd_seg + tr_seg

    out = J.decode(stream)
    expect = np.zeros((H, W), np.uint8)
    for sid, x, y in placements:
        sym = export[sid]
        expect[y : y + sym.shape[0], x : x + sym.shape[1]] |= sym
    np.testing.assert_array_equal(out, expect)


def test_halftone_region():
    """Pattern dictionary + halftone region: gray-coded bitplanes index
    square patterns onto the grid."""
    rng = np.random.default_rng(31)
    P = 4
    patterns = []
    for level in range(4):  # density ramp
        pat = np.zeros((P, P), np.uint8)
        pat.flat[: level * 5] = 1
        patterns.append(pat)
    gray = rng.integers(0, 4, size=(6, 8))
    W, H = 8 * P, 6 * P
    stream = (
        E.segment(1, 48, [], 1, E.page_info(W, H))
        + E.pattern_dict_segment(2, patterns)
        + E.halftone_region_segment(3, 2, gray, 4, P, W, H)
    )
    out = J.decode(stream)
    expect = np.zeros((H, W), np.uint8)
    for mg in range(6):
        for ng in range(8):
            expect[mg * P : (mg + 1) * P, ng * P : (ng + 1) * P] |= \
                patterns[int(gray[mg, ng])]
    np.testing.assert_array_equal(out, expect)


def test_mmr_generic_region():
    """MMR-coded generic region: G4 payload decodes with JBIG2
    foreground polarity (1 = black)."""
    bmp = np.zeros((20, 40), np.uint8)
    bmp[3:17, 5:35] = 1
    bmp[8:12, 10:30] = 0
    stream = E.segment(1, 48, [], 1, E.page_info(40, 20)) + \
        E.mmr_generic_region_segment(2, bmp)
    out = J.decode(stream)
    np.testing.assert_array_equal(out, bmp)


def _compose_expect(H, W, placements, export):
    expect = np.zeros((H, W), np.uint8)
    for p in placements:
        sid, x, y = p[0], p[1], p[2]
        sym = p[3] if len(p) == 4 and p[3] is not None else export[sid]
        expect[y : y + sym.shape[0], x : x + sym.shape[1]] |= sym
    return expect


def test_text_region_refinement_arith():
    """RI=1 instances decode the embedded refinement (6.3) instead of
    the dictionary symbol."""
    glyph_a = np.zeros((8, 6), np.uint8)
    glyph_a[1:7, 1:5] = 1
    glyph_b = np.zeros((8, 5), np.uint8)
    glyph_b[:, 2] = 1
    symbols = [glyph_a, glyph_b]
    sd_seg, order = E.symbol_dict_segment(2, symbols)
    export = [symbols[i] for i in order]
    target = export[1].copy()
    target[0, 0] ^= 1
    target[4, 3] ^= 1
    target[7, 1] ^= 1
    W, H = 44, 14
    placements = [(0, 2, 2), (1, 14, 2, target), (0, 26, 2)]
    tr_seg = E.text_region_segment(3, 2, export, placements, W, H)
    stream = E.segment(1, 48, [], 1, E.page_info(W, H)) + sd_seg + tr_seg
    out = J.decode(stream)
    np.testing.assert_array_equal(
        out, _compose_expect(H, W, placements, export)
    )


def test_text_region_refinement_huffman():
    """SBHUFF=1 refinement: RDW/RDH/RDX/RDY via B.15, BMSIZE via B.1,
    byte-aligned arithmetic refinement stream (6.4.11)."""
    glyph_a = np.zeros((8, 6), np.uint8)
    glyph_a[1:7, 1:5] = 1
    glyph_b = np.zeros((8, 5), np.uint8)
    glyph_b[:, 2] = 1
    glyph_b[3] = 1
    symbols = [glyph_a, glyph_b]
    sd_seg, order = E.symbol_dict_segment_huffman(2, symbols)
    export = [symbols[i] for i in order]
    t0 = export[0].copy()
    t0[2, 2] ^= 1
    t1 = export[1].copy()
    t1[6, 0] ^= 1
    t1[0, 4] ^= 1
    W, H = 48, 24
    placements = [(0, 2, 2, t0), (1, 16, 2), (1, 30, 2, t1),
                  (0, 4, 13)]
    tr_seg = E.text_region_segment_huffman(3, 2, export, placements, W, H)
    stream = E.segment(1, 48, [], 1, E.page_info(W, H)) + sd_seg + tr_seg
    out = J.decode(stream)
    np.testing.assert_array_equal(
        out, _compose_expect(H, W, placements, export)
    )


def test_symbol_dict_refagg_arith():
    """SDREFAGG=1: new symbols decode as single refinements
    (REFAGGNINST=1) and as aggregate text regions (REFAGGNINST>1)."""
    glyph_a = np.zeros((6, 5), np.uint8)
    glyph_a[1:5, 1:4] = 1
    glyph_b = np.zeros((6, 4), np.uint8)
    glyph_b[:, 1] = 1
    glyph_b[2] = 1
    base = [glyph_a, glyph_b]
    sd1, order = E.symbol_dict_segment(2, base)
    export = [base[i] for i in order]

    target = export[0].copy()
    target[0, 0] ^= 1
    target[5, 2] ^= 1
    agg_places = [(0, 0, 0), (1, export[0].shape[1] + 2, 0)]
    agg_w = export[0].shape[1] + 2 + export[1].shape[1]
    specs = [("refine", 0, target), ("agg", agg_places, agg_w, 6)]
    sd2 = E.symbol_dict_segment_refagg(3, 2, export, specs)

    agg_bmp = np.zeros((6, agg_w), np.uint8)
    for sid, sx, st in agg_places:
        s = export[sid]
        agg_bmp[st : st + s.shape[0], sx : sx + s.shape[1]] |= s
    exports2 = export + [target, agg_bmp]

    W, H = 60, 20
    placements = [(0, 1, 1), (2, 10, 1), (3, 20, 1), (1, 40, 1),
                  (2, 8, 10)]
    tr_seg = E.text_region_segment(4, 3, exports2, placements, W, H)
    stream = (E.segment(1, 48, [], 1, E.page_info(W, H))
              + sd1 + sd2 + tr_seg)
    out = J.decode(stream)
    np.testing.assert_array_equal(
        out, _compose_expect(H, W, placements, exports2)
    )


def test_symbol_dict_refagg_huffman():
    """SDHUFF=1 + SDREFAGG=1 (6.5.8.2 Huffman variant): per-symbol
    refinements with byte-aligned arithmetic streams, plus a Huffman
    aggregate text region."""
    glyph_a = np.zeros((6, 5), np.uint8)
    glyph_a[1:5, 1:4] = 1
    glyph_b = np.zeros((6, 4), np.uint8)
    glyph_b[:, 1] = 1
    glyph_b[2] = 1
    base = [glyph_a, glyph_b]
    sd1, order = E.symbol_dict_segment(2, base)
    export = [base[i] for i in order]

    target = export[0].copy()
    target[3, 0] ^= 1
    target[0, 3] ^= 1
    agg_places = [(1, 0, 0), (0, export[1].shape[1] + 1, 0)]
    agg_w = export[1].shape[1] + 1 + export[0].shape[1]
    specs = [("refine", 0, target), ("agg", agg_places, agg_w, 6)]
    sd2 = E.symbol_dict_segment_huffman_refagg(3, 2, export, specs)

    agg_bmp = np.zeros((6, agg_w), np.uint8)
    for sid, sx, st in agg_places:
        s = export[sid]
        agg_bmp[st : st + s.shape[0], sx : sx + s.shape[1]] |= s
    exports2 = export + [target, agg_bmp]

    W, H = 60, 20
    placements = [(2, 2, 1), (3, 14, 1), (0, 34, 1), (1, 44, 1)]
    tr_seg = E.text_region_segment(4, 3, exports2, placements, W, H)
    stream = (E.segment(1, 48, [], 1, E.page_info(W, H))
              + sd1 + sd2 + tr_seg)
    out = J.decode(stream)
    np.testing.assert_array_equal(
        out, _compose_expect(H, W, placements, exports2)
    )


def test_halftone_region_skip():
    """HENABLESKIP (6.6.5.1): grid cells falling outside the region are
    not coded; the decoder must build the same skip bitmap to stay in
    sync with the MQ stream."""
    rng = np.random.default_rng(41)
    P = 4
    patterns = []
    for level in range(4):
        pat = np.zeros((P, P), np.uint8)
        pat.flat[: level * 5] = 1
        patterns.append(pat)
    gray = rng.integers(0, 4, size=(6, 8))
    # region narrower/shorter than the grid: last 2 columns and last
    # row of cells are skipped entirely
    W, H = 6 * P, 5 * P
    stream = (
        E.segment(1, 48, [], 1, E.page_info(W, H))
        + E.pattern_dict_segment(2, patterns)
        + E.halftone_region_segment(3, 2, gray, 4, P, W, H,
                                    enable_skip=True)
    )
    out = J.decode(stream)
    expect = np.zeros((H, W), np.uint8)
    for mg in range(5):
        for ng in range(6):
            expect[mg * P : (mg + 1) * P, ng * P : (ng + 1) * P] |= \
                patterns[int(gray[mg, ng])]
    np.testing.assert_array_equal(out, expect)


def test_refinement_region_segment():
    """Standalone generic refinement region (type 40) refines the page
    content in place."""
    rng = np.random.default_rng(51)
    bmp = _random_bitmap(rng, 24, 40)
    # refine a sub-rect: flip a handful of pixels
    x0, y0, w0, h0 = 8, 4, 20, 12
    target = bmp[y0 : y0 + h0, x0 : x0 + w0].copy()
    target[3, 5] ^= 1
    target[0, 0] ^= 1
    target[h0 - 1, w0 - 1] ^= 1
    stream = (
        E.segment(1, 48, [], 1, E.page_info(40, 24))
        + E.generic_region_segment(2, bmp)
        + E.refinement_region_segment(
            3, target, bmp[y0 : y0 + h0, x0 : x0 + w0], x=x0, y=y0
        )
    )
    out = J.decode(stream)
    expect = bmp.copy()
    expect[y0 : y0 + h0, x0 : x0 + w0] = target
    np.testing.assert_array_equal(out, expect)
