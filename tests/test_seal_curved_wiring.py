"""SealOCR curved-text wiring (model-free: detector is mocked).

Covers the routing layer around AutoRectifier: polys from detect_polys
become rectified strips, straight quads stay in the remainder crop, and
text systems without a polygon detector fall back to the raw crop."""
from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rapiddoc_tpu.models.ocr.seal import SealOCR


class _FakeDetector:
    def __init__(self, polys):
        self._polys = polys

    def detect_polys(self, imgs, params=None):
        return [self._polys for _ in imgs]


class _FakeTextSystem:
    """Records the regions it is asked to read; returns one fake line per
    region so SealOCR's owner bookkeeping is exercised."""

    def __init__(self, polys=None):
        if polys is not None:
            self.detector = _FakeDetector(polys)
        self.seen: list[np.ndarray] = []

    def __call__(self, regions):
        self.seen.extend(regions)
        return [[{"text": f"r{i}"}] for i in range(len(regions))]


def _arc_poly(w=300, amp=40, y0=60, h=36, k=8):
    xs = np.linspace(10, w - 10, k)
    top = [(x, y0 + amp * np.sin((x - 10) / (w - 20) * np.pi)) for x in xs]
    bot = [(x, y + h) for x, y in top]
    return np.asarray(top + bot[::-1], np.float32)


def test_curved_poly_becomes_strip_plus_remainder():
    crop = np.full((200, 320, 3), 255, np.uint8)
    poly = _arc_poly(w=320)
    # a few glyph-like marks along the arc — NOT a closed outline, which
    # would (correctly) route into the ellipse-stamp branch instead
    for x, y in poly[: len(poly) // 2 : 2]:
        cv2.putText(crop, "A", (int(x), int(y) + 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 0, 0), 2)
    ts = _FakeTextSystem(polys=[poly])
    out = SealOCR(ts)(crop)
    assert isinstance(out, str) and out
    # one rectified strip + one remainder crop went to the text system
    assert len(ts.seen) == 2
    strip, remainder = ts.seen
    assert strip.shape[1] > strip.shape[0]  # wide strip
    assert remainder.shape == crop.shape
    # the curved band is painted out of the remainder
    ys = poly[: len(poly) // 2, 1].astype(int)
    xs = poly[: len(poly) // 2, 0].astype(int)
    mid_y = int(ys[len(ys) // 2] + 10)
    mid_x = int(xs[len(xs) // 2])
    assert (remainder[mid_y, mid_x] == 255).all()


def test_straight_poly_stays_in_remainder():
    crop = np.full((120, 300, 3), 255, np.uint8)
    k = 6
    xs = np.linspace(10, 290, k)
    top = [(x, 40.0) for x in xs]
    bot = [(x, 70.0) for x in xs]
    poly = np.asarray(top + bot[::-1], np.float32)
    ts = _FakeTextSystem(polys=[poly])
    SealOCR(ts)(crop)
    # straight band: no strip extracted, only the raw crop is read
    assert len(ts.seen) == 1
    assert ts.seen[0].shape == crop.shape


def test_no_detector_falls_back_to_raw_crop():
    crop = np.full((100, 100, 3), 255, np.uint8)
    ts = _FakeTextSystem(polys=None)  # no .detector attribute
    SealOCR(ts)(crop)
    assert len(ts.seen) == 1
