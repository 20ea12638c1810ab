"""Enhanced (v3) reading order: virtual lines + label tiers + separators.

Behavioral counterpart of the reference's xycut-plus-v3 chain
(reference: rapid_doc/utils/block_sort.py:15-246 — line-height virtual
lines inserted into tall blocks before cutting; rapid_doc/model/
reading_order/layout_parsing/xycut_plus_v3.py + xycut_enhanced/xycuts.py
— label-aware region sort with header/footer tiers and cross-column
separator handling). Re-derived, not translated: the key ideas are

1. subdivide tall blocks into virtual line boxes (~median line height)
   so projection-profile cuts see multi-column structure through
   figures and long paragraphs;
2. full-content-width blocks act as horizontal separators splitting the
   page into bands sorted top-down;
3. within a band, recursive XY-cut over the virtual lines; a block's
   rank is the best rank among its lines.

All pure host-side geometry (numpy) — never traced by XLA.
"""
from __future__ import annotations

import numpy as np

from .xycut import xycut_order


def virtual_lines_for_block(
    bbox: list[float], line_height: float, page_w: float, page_h: float
) -> list[list[float]]:
    """Split a block box into stacked line boxes (reference:
    utils/block_sort.py insert_lines_into_block :91-137 heuristics)."""
    x0, y0, x1, y1 = bbox
    bh, bw = y1 - y0, x1 - x0
    if bh <= line_height * 2 or line_height <= 0:
        return [[x0, y0, x1, y1]]
    if bh > page_h * 0.25 and page_w * 0.5 > bw > page_w * 0.25:
        n = max(1, int(bh / line_height))  # probable column fragment: fine
    elif bw > page_w * 0.4:
        n = 3  # wide complex region: keep coarse
    elif bw > page_w * 0.25:
        n = max(1, int(bh / line_height))
    elif bh / max(bw, 1e-6) > 1.2:
        return [[x0, y0, x1, y1]]  # slender: do not split
    else:
        n = 2
    step = bh / n
    return [[x0, y0 + i * step, x1, y0 + (i + 1) * step] for i in range(n)]


def _median_line_height(blocks: list[dict]) -> float:
    heights = [
        ln["bbox"][3] - ln["bbox"][1]
        for b in blocks
        for ln in b.get("lines", [])
        if ln.get("bbox") and ln["bbox"][3] > ln["bbox"][1]
    ]
    return float(np.median(heights)) if heights else 10.0


def _band_split(
    blocks: list[dict], idxs: list[int], content_w: float
) -> list[list[int]]:
    """Full-width blocks separate the page into top-down bands. The
    separator itself heads its band."""
    seps = sorted(
        (
            i
            for i in idxs
            if (blocks[i]["bbox"][2] - blocks[i]["bbox"][0]) >= content_w * 0.86
        ),
        key=lambda i: blocks[i]["bbox"][1],
    )
    if not seps:
        return [idxs]
    bands: list[list[int]] = []
    rest = [i for i in idxs if i not in set(seps)]
    prev_y = -np.inf
    for k, s in enumerate(seps):
        sy = (blocks[s]["bbox"][1] + blocks[s]["bbox"][3]) / 2
        above = [
            i
            for i in rest
            if prev_y <= (blocks[i]["bbox"][1] + blocks[i]["bbox"][3]) / 2 < sy
        ]
        if above:
            bands.append(above)
        bands.append([s])
        prev_y = sy
    below = [
        i for i in rest
        if (blocks[i]["bbox"][1] + blocks[i]["bbox"][3]) / 2 >= prev_y
    ]
    if below:
        bands.append(below)
    return bands


# label tiers (reference: layout_parsing/setting.py BLOCK_LABEL_MAP +
# xycut_enhanced/xycuts.py:460 — headers first, footers last, unordered
# blocks distance-inserted, doc_title heads its band)
HEADER_LABELS = {"header", "header_image"}
FOOTER_LABELS = {"footer", "footer_image", "footnote", "vision_footnote"}
UNORDERED_LABELS = {"aside_text", "seal", "number", "formula_number"}
DOC_TITLE_LABELS = {"doc_title"}


def _normal_sort(blocks: list[dict], idxs: list[int], line_h: float) -> list[int]:
    """Row-major sort with line-height quantized y (reference
    sort_normal_blocks)."""
    return sorted(
        idxs,
        key=lambda i: (
            blocks[i]["bbox"][1] // max(line_h, 1.0),
            blocks[i]["bbox"][0],
        ),
    )


def _distance_insert(order: list[int], blocks: list[dict], idx: int) -> None:
    """Insert an unordered block after its nearest sorted neighbor
    (reference euclidean_insert flavor)."""
    if not order:
        order.append(idx)
        return
    cx = (blocks[idx]["bbox"][0] + blocks[idx]["bbox"][2]) / 2
    cy = (blocks[idx]["bbox"][1] + blocks[idx]["bbox"][3]) / 2

    def dist(j: int) -> float:
        bx = (blocks[j]["bbox"][0] + blocks[j]["bbox"][2]) / 2
        by = (blocks[j]["bbox"][1] + blocks[j]["bbox"][3]) / 2
        return (bx - cx) ** 2 + (by - cy) ** 2

    nearest = min(range(len(order)), key=lambda k: dist(order[k]))
    order.insert(nearest + 1, idx)


def sort_blocks_v3(
    blocks: list[dict], page_w: float, page_h: float
) -> list[int]:
    """Reading-order permutation over block dicts (need 'bbox', optional
    'lines' and 'original_label'). Raises on malformed input — callers
    fall back to plain xycut, mirroring the reference's try/except chain."""
    n = len(blocks)
    if n <= 1:
        return list(range(n))
    line_h = _median_line_height(blocks)

    def label(i: int) -> str:
        return str(blocks[i].get("original_label") or "")

    headers = [i for i in range(n) if label(i) in HEADER_LABELS]
    footers = [i for i in range(n) if label(i) in FOOTER_LABELS]
    unordered = [i for i in range(n) if label(i) in UNORDERED_LABELS]
    special = set(headers) | set(footers) | set(unordered)
    body = [i for i in range(n) if i not in special]

    xs = [blocks[i]["bbox"][0] for i in body] + [
        blocks[i]["bbox"][2] for i in body
    ]
    content_w = max(xs) - min(xs) if xs else page_w

    bands = _band_split(blocks, body, content_w)
    order: list[int] = []
    for band in bands:
        # doc_title leads its band (reference xycuts.py:451-453)
        titles = [i for i in band if label(i) in DOC_TITLE_LABELS]
        band = [i for i in band if i not in set(titles)]
        order.extend(sorted(titles, key=lambda i: blocks[i]["bbox"][1]))
        if len(band) == 1:
            order.extend(band)
            continue
        if not band:
            continue
        # virtual lines: id -> owning block
        line_boxes: list[list[float]] = []
        owners: list[int] = []
        for i in band:
            real = [
                ln["bbox"]
                for ln in blocks[i].get("lines", [])
                if ln.get("bbox")
            ]
            vls = (
                real
                if len(real) > 1
                else virtual_lines_for_block(
                    blocks[i]["bbox"], line_h, page_w, page_h
                )
            )
            for vb in vls:
                line_boxes.append(vb)
                owners.append(i)
        perm = xycut_order(
            np.asarray(line_boxes, np.float64),
            min_gap_x=line_h * 0.5,
            min_gap_y=line_h * 0.3,
        )
        best_rank: dict[int, int] = {}
        for rank, li in enumerate(perm):
            b = owners[li]
            if b not in best_rank:
                best_rank[b] = rank
        order.extend(sorted(band, key=lambda i: best_rank.get(i, len(perm))))
    for i in unordered:
        _distance_insert(order, blocks, i)
    return (
        _normal_sort(blocks, headers, line_h)
        + order
        + _normal_sort(blocks, footers, line_h)
    )
