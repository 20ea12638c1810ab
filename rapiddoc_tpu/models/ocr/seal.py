"""Seal (stamp) OCR: polygon detection params + curved-text rectification.

Role parity with the reference seal path (reference:
rapid_doc/model/ocr/rapid_ocr.py:122-151 seal det params — thresh 0.2,
box_thresh 0.6, unclip 0.5, limit 736/min, poly boxes;
seal_det_warp.py AutoRectifier curved-text unwarp; seal_crop.py poly
sort/crop). Circular stamps are unwrapped with a polar transform; straight
seal text goes through the regular quad crop.
"""
from __future__ import annotations

import math

import cv2
import numpy as np

from .pre_post import DBPostParams

SEAL_DET_PARAMS = DBPostParams(
    thresh=0.2, box_thresh=0.6, unclip_ratio=0.5, use_dilation=False
)


def detect_circle(img: np.ndarray) -> tuple[int, int, int] | None:
    """(cx, cy, r) of the dominant circle, if the crop looks like a stamp."""
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
    h, w = gray.shape
    blurred = cv2.medianBlur(gray, 5)
    circles = cv2.HoughCircles(
        blurred, cv2.HOUGH_GRADIENT, dp=1.5, minDist=max(h, w),
        param1=120, param2=40,
        minRadius=min(h, w) // 4, maxRadius=max(h, w) // 2 + 8,
    )
    if circles is None:
        return None
    cx, cy, r = circles[0][0]
    return int(cx), int(cy), int(r)


def unwrap_circular_text(
    img: np.ndarray, cx: int, cy: int, r: int, band: float = 0.35
) -> np.ndarray:
    """Unwrap the outer text ring of a circular stamp into a straight strip."""
    out_w = int(2 * math.pi * r)
    out_h = max(12, int(r * band))
    polar = cv2.warpPolar(
        img, (r, out_w), (cx, cy), r,
        cv2.WARP_POLAR_LINEAR + cv2.INTER_LINEAR,
    )
    # polar: rows = angle, cols = radius; outer band then rotate to strip
    strip = polar[:, r - out_h :]
    strip = cv2.rotate(strip, cv2.ROTATE_90_COUNTERCLOCKWISE)
    return strip


def rectify_curved_polygon(img: np.ndarray, pts) -> np.ndarray | None:
    """Straighten arbitrarily curved text given its 2k-point polygon.

    pts: first k points along the top edge (left->right), last k along the
    bottom edge (right->left) — the DB poly convention. Each quad segment
    warps perspectively to an upright rectangle slice; slices concatenate
    into one straight strip. General-curve counterpart of the reference's
    CurveTextRectifier/AutoRectifier (reference: seal_det_warp.py:119-616),
    which fits curves then remaps — piecewise perspective is the same
    geometry without the least-squares fit.
    """
    pts = np.asarray(pts, np.float32)
    if len(pts) < 6 or len(pts) % 2:
        return None
    k = len(pts) // 2
    top = pts[:k]
    bot = pts[k:][::-1]
    heights = np.linalg.norm(top - bot, axis=1)
    out_h = int(np.clip(np.median(heights), 8, 256))
    slices = []
    for i in range(k - 1):
        w = 0.5 * (
            np.linalg.norm(top[i + 1] - top[i])
            + np.linalg.norm(bot[i + 1] - bot[i])
        )
        w = int(max(2, round(w)))
        src = np.asarray(
            [top[i], top[i + 1], bot[i + 1], bot[i]], np.float32
        )
        dst = np.asarray(
            [[0, 0], [w, 0], [w, out_h], [0, out_h]], np.float32
        )
        m = cv2.getPerspectiveTransform(src, dst)
        slices.append(
            cv2.warpPerspective(img, m, (w, out_h), flags=cv2.INTER_LINEAR,
                                borderValue=(255, 255, 255))
        )
    if not slices:
        return None
    return np.concatenate(slices, axis=1)


class AutoRectifier:
    """General curved-text rectification from a detected 2k-point polygon.

    Counterpart of the reference AutoRectifier (reference:
    rapid_doc/model/ocr/seal_det_warp.py:119-823): the reference fits
    polynomial curves to the text poly's long edges and densely remaps the
    band to a straight strip; this does the same with a quartic
    least-squares fit per edge and one cv2.remap. Arc-length-uniform
    column sampling of the mid-curve compensates the horizontal
    compression a steep arc would otherwise get. Falls back to the
    piecewise-perspective rectify_curved_polygon for polys too short to
    fit (k < 4)."""

    def __init__(self, degree: int = 4, max_h: int = 64):
        self.degree = degree
        self.max_h = max_h

    def __call__(self, img: np.ndarray, pts) -> np.ndarray | None:
        pts = np.asarray(pts, np.float32)
        if len(pts) < 6 or len(pts) % 2:
            return None
        k = len(pts) // 2
        if k < 4:
            return rectify_curved_polygon(img, pts)
        top = pts[:k]
        bot = pts[k:][::-1]
        # near-vertical text: column-parameterized fits are degenerate
        x_span = max(top[:, 0].max() - top[:, 0].min(), 1.0)
        y_span = max(
            pts[:, 1].max() - pts[:, 1].min(), 1.0
        )
        if x_span < y_span * 0.75:
            return rectify_curved_polygon(img, pts)
        deg = int(min(self.degree, k - 1))
        try:
            top_fit = np.polyfit(top[:, 0], top[:, 1], deg)
            bot_fit = np.polyfit(bot[:, 0], bot[:, 1], deg)
        except (np.linalg.LinAlgError, ValueError):
            return rectify_curved_polygon(img, pts)
        x0 = float(min(top[:, 0].min(), bot[:, 0].min()))
        x1 = float(max(top[:, 0].max(), bot[:, 0].max()))
        # arc length of the mid curve -> output width; uniform arc-length
        # sampling so curved ends are not horizontally squashed
        mid_fit = (top_fit + bot_fit) / 2.0
        xs_dense = np.linspace(x0, x1, 512)
        ys_dense = np.polyval(mid_fit, xs_dense)
        seg = np.hypot(np.diff(xs_dense), np.diff(ys_dense))
        arc = np.concatenate([[0.0], np.cumsum(seg)])
        out_w = int(np.clip(arc[-1], 8, 4096))
        thick = np.abs(
            np.polyval(bot_fit, xs_dense) - np.polyval(top_fit, xs_dense)
        )
        out_h = int(np.clip(np.median(thick), 8, self.max_h))
        # invert arc-length: for each output column, the source x
        u = np.linspace(0.0, arc[-1], out_w)
        src_x = np.interp(u, arc, xs_dense)  # (out_w,)
        ty = np.polyval(top_fit, src_x)
        by = np.polyval(bot_fit, src_x)
        v = (np.arange(out_h, dtype=np.float32) + 0.5) / out_h  # (out_h,)
        map_x = np.broadcast_to(
            src_x[None, :], (out_h, out_w)
        ).astype(np.float32)
        map_y = (ty[None, :] + v[:, None] * (by - ty)[None, :]).astype(
            np.float32
        )
        return cv2.remap(
            img, map_x, map_y, cv2.INTER_LINEAR,
            borderValue=(255, 255, 255),
        )


def detect_ellipse(img: np.ndarray) -> tuple | None:
    """((cx, cy), (major, minor), angle) of the dominant stamp ellipse."""
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
    h, w = gray.shape
    _, binary = cv2.threshold(
        gray, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU
    )
    contours, _ = cv2.findContours(
        binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )
    best = None
    for c in contours:
        if len(c) < 20:
            continue
        (cx, cy), (ma, mb), angle = cv2.fitEllipse(c)
        if ma < min(h, w) * 0.4 or mb < min(h, w) * 0.3:
            continue
        if ma > max(h, w) * 1.2 or mb > max(h, w) * 1.2:
            continue
        area = cv2.contourArea(c)
        if best is None or area > best[0]:
            best = (area, ((cx, cy), (ma, mb), angle))
    return best[1] if best else None


def unwrap_elliptical_text(img: np.ndarray, ellipse) -> np.ndarray | None:
    """Scale the image so the stamp ellipse becomes a circle, then unwrap
    its text ring (general ovals, reference AutoRectifier scope)."""
    (cx, cy), (ma, mb), angle = ellipse
    if mb <= 0:
        return None
    # rotate so the major axis is horizontal, then squash x to a circle
    h, w = img.shape[:2]
    rot = cv2.getRotationMatrix2D((cx, cy), angle - 90, 1.0)
    rotated = cv2.warpAffine(img, rot, (w, h), borderValue=(255, 255, 255))
    ratio = mb / ma
    squashed = cv2.resize(
        rotated, (max(1, int(w * ratio)), h), interpolation=cv2.INTER_LINEAR
    )
    r = int(mb / 2)
    return unwrap_circular_text(squashed, int(cx * ratio), int(cy), r)


class SealOCR:
    """Detect and read stamp text inside a seal region crop."""

    def __init__(self, text_system):
        self.text_system = text_system

    def __call__(self, crop: np.ndarray) -> str:
        return self.batch([crop])[0]

    def batch(self, crops: list[np.ndarray]) -> list[str]:
        """All seals' rectified strips + centers go through the text
        system in ONE batched call."""
        regions: list[np.ndarray] = []
        owners: list[int] = []
        for i, crop in enumerate(crops):
            self._debug_dump(crop)
            circle = detect_circle(crop)
            if circle is not None:
                cx, cy, r = circle
                try:
                    strip = unwrap_circular_text(crop, cx, cy, r)
                    regions.append(strip)
                    owners.append(i)
                except cv2.error:
                    pass
                # center text (horizontal) from the inner region
                inner = crop[
                    max(cy - r // 2, 0) : cy + r // 2,
                    max(cx - r // 2, 0) : cx + r // 2,
                ]
                if inner.size:
                    regions.append(inner)
                    owners.append(i)
                continue
            ellipse = detect_ellipse(crop)
            if ellipse is not None:
                try:
                    strip = unwrap_elliptical_text(crop, ellipse)
                except cv2.error:
                    strip = None
                if strip is not None and strip.size:
                    regions.append(strip)
                    owners.append(i)
                (ecx, ecy), (ma, mb), _ = ellipse
                iy0 = max(int(ecy - mb / 4), 0)
                ix0 = max(int(ecx - ma / 4), 0)
                inner = crop[iy0 : int(ecy + mb / 4), ix0 : int(ecx + ma / 4)]
                if inner.size:
                    regions.append(inner)
                    owners.append(i)
                continue
            # no circular/elliptical stamp: general curved text — detect
            # 2k-point polys and AutoRectify each band (reference:
            # seal_det_warp.py AutoRectifier over det_box_type='poly')
            strips, remainder = self._curved_strips(crop)
            for s in strips:
                regions.append(s)
                owners.append(i)
            # the remainder (curved bands painted out) keeps any straight
            # lines readable without double-reading the curved text
            regions.append(remainder)
            owners.append(i)
        texts: list[list[str]] = [[] for _ in crops]
        if regions:
            for i, items in zip(owners, self.text_system(regions)):
                texts[i].extend(item["text"] for item in items)
        return [" ".join(t for t in ts if t) for ts in texts]

    def _curved_strips(
        self, crop: np.ndarray
    ) -> tuple[list[np.ndarray], np.ndarray]:
        """Detect curved text polys in the crop and rectify each to a
        straight strip. Returns (strips, remainder) where remainder is the
        crop with the rectified bands painted out — straight lines (quads
        and effectively-straight polys) stay in the remainder for the
        normal det+rec path; rectifying them would only lose resolution."""
        det = getattr(self.text_system, "detector", None)
        if det is None or not hasattr(det, "detect_polys"):
            return [], crop
        try:
            polys = det.detect_polys([crop], params=SEAL_DET_PARAMS)[0]
        except Exception:
            return [], crop
        rectifier = AutoRectifier()
        strips: list[np.ndarray] = []
        remainder = crop
        for poly in polys:
            if len(poly) <= 4:
                continue
            top = poly[: len(poly) // 2]
            # curvature gate: skip effectively-straight bands
            resid = np.abs(
                np.polyval(np.polyfit(top[:, 0], top[:, 1], 1), top[:, 0])
                - top[:, 1]
            ).max() if len(top) >= 3 else 0.0
            if resid < 2.0:
                continue
            strip = rectifier(crop, poly)
            if strip is not None and strip.size:
                strips.append(strip)
                if remainder is crop:
                    remainder = crop.copy()
                cv2.fillPoly(
                    remainder, [poly.astype(np.int32)], (255, 255, 255)
                )
        return strips, remainder

    _dump_n = 0

    def _debug_dump(self, crop: np.ndarray) -> None:
        """Dump seal crops for visual QA when RAPIDDOC_SEAL_OCR_DEBUG[_DIR]
        / MINERU_SEAL_OCR_DEBUG[_DIR] is set (reference:
        rapid_ocr.py:164-223 seal debug dumps)."""
        import os

        target = None
        for prefix in ("RAPIDDOC_", "MINERU_"):
            target = os.environ.get(f"{prefix}SEAL_OCR_DEBUG_DIR") or target
            if not target and os.environ.get(f"{prefix}SEAL_OCR_DEBUG"):
                target = "/tmp/rapiddoc_seal_debug"
        if not target:
            return
        try:
            os.makedirs(target, exist_ok=True)
            cv2.imwrite(
                os.path.join(target, f"seal_{SealOCR._dump_n:04d}.png"),
                cv2.cvtColor(crop, cv2.COLOR_RGB2BGR),
            )
            SealOCR._dump_n += 1
        except Exception:
            pass
