"""Checkbox detection + ticked/unticked classification (pure OpenCV).

Role parity with the reference (reference:
rapid_doc/utils/checkbox_det_cls.py:6-132 — morphological square
detection, ink-density tick classification).
"""
from __future__ import annotations

import cv2
import numpy as np


def detect_checkboxes(
    img: np.ndarray,
    min_size: int = 8,
    max_size: int = 60,
) -> list[dict]:
    """Returns [{bbox, checked: bool}] for square checkbox-like shapes."""
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
    binary = cv2.adaptiveThreshold(
        gray, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV, 15, 10
    )
    contours, _ = cv2.findContours(
        binary, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    results = []
    for contour in contours:
        x, y, w, h = cv2.boundingRect(contour)
        if not (min_size <= w <= max_size and min_size <= h <= max_size):
            continue
        if not 0.75 <= w / max(h, 1) <= 1.33:
            continue
        approx = cv2.approxPolyDP(contour, 0.04 * cv2.arcLength(contour, True), True)
        if len(approx) != 4 or not cv2.isContourConvex(approx):
            continue
        area = cv2.contourArea(contour)
        if area < 0.6 * w * h:
            continue
        inner = binary[y + h // 5 : y + 4 * h // 5, x + w // 5 : x + 4 * w // 5]
        fill = float(inner.mean()) / 255.0 if inner.size else 0.0
        results.append(
            {
                "bbox": [float(x), float(y), float(x + w), float(y + h)],
                "checked": fill > 0.12,
            }
        )
    # dedup nested detections
    results.sort(key=lambda r: (r["bbox"][0], r["bbox"][1]))
    dedup: list[dict] = []
    for r in results:
        if not any(
            abs(r["bbox"][0] - d["bbox"][0]) < 4 and abs(r["bbox"][1] - d["bbox"][1]) < 4
            for d in dedup
        ):
            dedup.append(r)
    return dedup
