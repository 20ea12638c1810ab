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
            regions.append(crop)
            owners.append(i)
        texts: list[list[str]] = [[] for _ in crops]
        if regions:
            for i, items in zip(owners, self.text_system(regions)):
                texts[i].extend(item["text"] for item in items)
        return [" ".join(t for t in ts if t) for ts in texts]

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
