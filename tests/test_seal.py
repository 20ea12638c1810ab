"""Seal OCR: curved-text rectification + ellipse unwrap."""
import numpy as np


# --------------------------------------------- curved-text rectification

def test_rectify_curved_polygon_markers():
    """Markers placed along an arc land evenly spaced and level in the
    rectified strip (general curved-text rectification)."""
    import cv2

    from rapiddoc_tpu.models.ocr.seal import rectify_curved_polygon

    img = np.full((300, 400, 3), 255, np.uint8)
    cx, cy, r = 200.0, 260.0, 180.0
    k = 9
    angles = np.linspace(np.deg2rad(235), np.deg2rad(305), k)
    top, bot = [], []
    for j, a in enumerate(angles):
        ox, oy = np.cos(a), np.sin(a)
        top.append([cx + ox * (r + 25), cy + oy * (r + 25)])
        bot.append([cx + ox * (r - 25), cy + oy * (r - 25)])
        if j < k - 1:
            mid_a = (a + angles[j + 1]) / 2
            mx = int(cx + np.cos(mid_a) * r)
            my = int(cy + np.sin(mid_a) * r)
            cv2.rectangle(img, (mx - 4, my - 4), (mx + 4, my + 4), (0, 0, 0), -1)
    poly = top + bot[::-1]
    strip = rectify_curved_polygon(img, poly)
    assert strip is not None
    sh, sw = strip.shape[:2]
    assert sw > sh * 3  # thin wide strip
    gray = cv2.cvtColor(strip, cv2.COLOR_RGB2GRAY)
    ys, xs = np.where(gray < 100)
    assert len(xs) > 50
    # marker ink sits in the vertical middle band of the strip
    assert ys.std() < sh * 0.25
    assert abs(float(ys.mean()) - sh / 2) < sh * 0.2
    # markers spread across (not bunched): x range covers most of the strip
    assert xs.max() - xs.min() > sw * 0.7


def test_detect_and_unwrap_ellipse():
    import cv2

    from rapiddoc_tpu.models.ocr.seal import detect_ellipse, unwrap_elliptical_text

    img = np.full((240, 360, 3), 255, np.uint8)
    cv2.ellipse(img, (180, 120), (150, 90), 0, 0, 360, (150, 30, 30), 4)
    ellipse = detect_ellipse(img)
    assert ellipse is not None
    (ecx, ecy), (ma, mb), _ = ellipse
    assert abs(ecx - 180) < 15 and abs(ecy - 120) < 15
    strip = unwrap_elliptical_text(img, ellipse)
    assert strip is not None and strip.shape[1] > strip.shape[0]
