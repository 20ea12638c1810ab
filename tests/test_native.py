"""Native host-ops library: build, correctness vs pure-Python."""
import numpy as np
import pytest

from rapiddoc_tpu.utils import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_png_defilter_matches_python(lib_ok):
    import zlib

    from rapiddoc_tpu.pdfio import filters

    rng = np.random.default_rng(0)
    row_len, nrows, bpp = 96, 40, 3
    raw = rng.integers(0, 256, nrows * row_len, dtype=np.uint8)
    # encode with PNG filters (use filter type per row)
    encoded = bytearray()
    prev = np.zeros(row_len, np.uint8)
    for r in range(nrows):
        row = raw[r * row_len : (r + 1) * row_len]
        ftype = r % 5
        encoded.append(ftype)
        if ftype == 0:
            enc = row
        elif ftype == 1:
            shifted = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            enc = (row.astype(int) - shifted).astype(np.uint8)
        elif ftype == 2:
            enc = (row.astype(int) - prev).astype(np.uint8)
        elif ftype == 3:
            shifted = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            enc = (row.astype(int) - ((shifted.astype(int) + prev) // 2)).astype(np.uint8)
        else:  # paeth
            enc = np.empty(row_len, np.uint8)
            for i in range(row_len):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (int(row[i]) - pred) & 0xFF
        encoded += bytes(enc)
        prev = row
    decoded = native.png_defilter(bytes(encoded), row_len, bpp)
    np.testing.assert_array_equal(
        np.frombuffer(decoded, np.uint8), raw
    )
    # and through the filter pipeline (zlib + predictor 15)
    comp = zlib.compress(bytes(encoded))
    out = filters.flate_decode(
        comp, {"Predictor": 15, "Colors": 3, "BitsPerComponent": 8,
               "Columns": row_len // 3},
    )
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), raw)


def test_native_iou_matches_numpy(lib_ok):
    from rapiddoc_tpu.utils import boxes as B

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 100, (80, 2))
    a = np.concatenate([a, a + rng.uniform(1, 40, (80, 2))], axis=1)
    b = rng.uniform(0, 100, (70, 2))
    b = np.concatenate([b, b + rng.uniform(1, 40, (70, 2))], axis=1)
    fast = native.iou_matrix(a, b)
    # force the numpy path by slicing under the native threshold
    slow = B.iou_matrix(a[:5], b[:5])
    np.testing.assert_allclose(fast[:5, :5], slow, atol=1e-12)


def test_native_nms_matches_python(lib_ok):
    from rapiddoc_tpu.utils import boxes as B

    rng = np.random.default_rng(2)
    boxes = rng.uniform(0, 60, (50, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 30, (50, 2))], axis=1)
    scores = rng.uniform(0, 1, 50)
    fast = native.nms(boxes, scores, 0.5)
    slow = B.nms(boxes, scores, 0.5)
    assert fast == slow
