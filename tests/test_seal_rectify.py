"""Curved-text rectification tests (seal OCR AutoRectifier path).

Model-free: a straight text raster is warped by a KNOWN vertical
displacement field, the ground-truth polygon is derived from the same
field, and the rectifier must reproduce the straight original (reference
behavior: rapid_doc/model/ocr/seal_det_warp.py:119-823 AutoRectifier)."""
from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rapiddoc_tpu.models.ocr.pre_post import DBPostParams, db_postprocess_poly
from rapiddoc_tpu.models.ocr.seal import AutoRectifier


def _straight_text(w=360, h=48, text="CURVED SEAL TEXT 123"):
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGB", (w, h), (255, 255, 255))
    d = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 28
        )
    except OSError:
        font = ImageFont.load_default()
    d.text((8, 8), text, fill=(0, 0, 0), font=font)
    return np.asarray(img, np.uint8)


def _warp_down(img: np.ndarray, f) -> np.ndarray:
    """out(x, y) = img(x, y - f(x)): shifts column x down by f(x)."""
    h, w = img.shape[:2]
    pad = 80
    canvas = np.full((h + 2 * pad, w, 3), 255, np.uint8)
    xs = np.arange(w, dtype=np.float32)
    fy = np.asarray([f(x) for x in xs], np.float32)
    map_x = np.broadcast_to(xs[None, :], (h + 2 * pad, w)).astype(np.float32)
    map_y = (
        np.arange(h + 2 * pad, dtype=np.float32)[:, None] - pad - fy[None, :]
    )
    warped = cv2.remap(
        img, map_x, map_y, cv2.INTER_LINEAR, borderValue=(255, 255, 255)
    )
    canvas[:] = warped
    return canvas, pad, fy


def _ncc(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float32).ravel()
    b = b.astype(np.float32).ravel()
    a -= a.mean()
    b -= b.mean()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / denom) if denom else 0.0


@pytest.mark.parametrize(
    "field",
    [
        lambda x: 30.0 * np.sin(x / 360.0 * np.pi),          # arc
        lambda x: 1e-4 * (x - 180.0) ** 2,                    # parabola
        lambda x: 12.0 * np.sin(x / 80.0) + 0.05 * (x - 180.0),  # wave+tilt
    ],
    ids=["arc", "parabola", "wave"],
)
def test_autorectifier_recovers_straight_text(field):
    straight = _straight_text()
    h, w = straight.shape[:2]
    warped, pad, fy = _warp_down(straight, field)
    k = 10
    xs = np.linspace(0, w - 1, k)
    top = [(x, pad + field(x)) for x in xs]
    bot = [(x, pad + h + field(x)) for x in xs]
    poly = np.asarray(top + bot[::-1], np.float32)
    strip = AutoRectifier()(warped, poly)
    assert strip is not None and strip.size
    # the strip must match the straight original (after resize: arc-length
    # sampling slightly re-scales x)
    resized = cv2.resize(strip, (w, h))
    score = _ncc(resized, straight)
    assert score > 0.75, score


def test_autorectifier_vertical_fallback():
    """Near-vertical polys route to the piecewise-perspective fallback
    instead of the degenerate column fit."""
    img = np.full((200, 60, 3), 255, np.uint8)
    cv2.putText(img, "A", (10, 100), cv2.FONT_HERSHEY_SIMPLEX, 2, (0, 0, 0), 3)
    k = 5
    ys = np.linspace(10, 190, k)
    left = [(10.0, y) for y in ys]
    right = [(50.0, y) for y in ys]
    # vertical band: top edge = left side, bottom edge = right side
    poly = np.asarray(left + right[::-1], np.float32)
    strip = AutoRectifier()(img, poly)
    assert strip is not None and strip.size


def test_db_postprocess_poly_arc_band():
    """An arc-shaped probability band comes back as a 2k-point poly whose
    top edge follows the arc."""
    H, W = 160, 320
    prob = np.zeros((H, W), np.float32)
    xs = np.arange(20, 300)
    ys = (80 + 40 * np.sin((xs - 20) / 280.0 * np.pi)).astype(np.int32)
    for x, y in zip(xs, ys):
        prob[max(y - 8, 0) : y + 8, x] = 0.9
    polys, scores = db_postprocess_poly(
        prob, H, W, params=DBPostParams(thresh=0.3, box_thresh=0.5,
                                        unclip_ratio=0.0),
        n_points=8,
    )
    assert len(polys) == 1, len(polys)
    poly = polys[0]
    assert len(poly) == 16
    top = poly[:8]
    # top edge must track the arc: y(top) ~ arc(x) - 8
    for x, y in top:
        expect = 80 + 40 * np.sin((x - 20) / 280.0 * np.pi) - 8
        assert abs(y - expect) < 7.0, (x, y, expect)
    # left->right ordering of the top edge
    assert np.all(np.diff(top[:, 0]) > 0)


def test_db_postprocess_poly_vertical_quad():
    """A vertical band degrades to the 4-point quad path."""
    H, W = 200, 120
    prob = np.zeros((H, W), np.float32)
    prob[20:180, 50:70] = 0.9
    polys, _ = db_postprocess_poly(
        prob, H, W, params=DBPostParams(thresh=0.3, box_thresh=0.5,
                                        unclip_ratio=0.0),
    )
    assert len(polys) == 1
    assert len(polys[0]) == 4
