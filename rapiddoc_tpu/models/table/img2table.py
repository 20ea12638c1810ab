"""Model-free OpenCV table extraction (img2table-style fallback).

Role parity with the reference's optional img2table path (reference:
rapid_doc/model/table/img2table_self/ + rapid_table.py:219-249 — a pure
OpenCV ruling-line extractor used when the learned structure models are
unavailable or produce nothing). Host-only, no device work: adaptive
threshold -> morphological H/V line extraction -> lattice -> cell
components, reusing the UNet stack's cell/grid recovery.
"""
from __future__ import annotations

import cv2
import numpy as np

from .unet import cells_to_grid, extract_cells_from_mask


def ruling_line_mask(img: np.ndarray, min_line_frac: float = 0.25) -> np.ndarray:
    """Binary mask of horizontal+vertical ruling lines. `min_line_frac`
    is the minimum line length as a fraction of the image side."""
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
    binary = cv2.adaptiveThreshold(
        255 - gray, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY,
        15, -2,
    )
    h, w = gray.shape
    hk = max(8, int(w * min_line_frac * 0.5))
    vk = max(8, int(h * min_line_frac * 0.5))
    horiz = cv2.morphologyEx(
        binary, cv2.MORPH_OPEN, cv2.getStructuringElement(cv2.MORPH_RECT, (hk, 1))
    )
    vert = cv2.morphologyEx(
        binary, cv2.MORPH_OPEN, cv2.getStructuringElement(cv2.MORPH_RECT, (1, vk))
    )
    return ((horiz > 0) | (vert > 0)).astype(np.float32)


def opencv_table_extract(
    img: np.ndarray,
) -> tuple[list[list[float]], list[tuple[int, int, int, int]]]:
    """Image -> (cell boxes in source px, logical grid). Empty when no
    ruling lattice is found (caller falls back to wireless models)."""
    mask = ruling_line_mask(img)
    if mask.sum() < 50:
        return [], []
    cells = extract_cells_from_mask(mask, min_cell_area=100)
    if len(cells) < 2:
        return [], []
    grid = cells_to_grid(cells)
    return cells, grid
