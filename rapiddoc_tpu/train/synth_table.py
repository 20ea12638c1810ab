"""Synthetic tables with full ground truth for table-model training.

One generator feeds three demo trainers (train/table.py):
- UNET wired-table segmentation: the drawn grid lines ARE the mask GT;
- wired/wireless classifier: full grid vs head/foot rules only;
- SLANet_plus structure decoder: the HTML construction emits the exact
  merged-no-span token stream (models/table/slanet.STRUCT_TOKENS) plus
  per-<td> cell boxes.
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np
from PIL import Image, ImageDraw

from ..models.table.slanet import IMG_SIZE as SLA_SIZE
from .synth import _font, random_text


@dataclass
class TableSample:
    img: np.ndarray                 # uint8 RGB (H, W, 3)
    line_mask: np.ndarray           # uint8 (H, W) 0/1 grid-line mask
    wired: bool
    tokens: list[str] = field(default_factory=list)   # structure tokens
    cell_boxes: list[tuple[float, float, float, float]] = field(
        default_factory=list
    )                               # per-<td> tight bbox in img px
    cell_texts: list[str] = field(default_factory=list)
    n_rows: int = 0
    n_cols: int = 0


def _truncate(text: str, font, max_w: int):
    bbox = font.getbbox(text)
    while text and bbox[2] - bbox[0] > max_w:
        text = text.rsplit(" ", 1)[0] if " " in text else text[:-2]
        bbox = font.getbbox(text) if text else (0, 0, 0, 0)
    return text, bbox


def render_table(
    rng: random.Random, wired: bool | None = None
) -> TableSample:
    if wired is None:
        wired = rng.random() < 0.5
    nr = rng.randint(2, 7)
    nc = rng.randint(2, 6)
    col_w = [rng.randint(46, 120) for _ in range(nc)]
    row_h = [rng.randint(18, 40) for _ in range(nr)]
    margin = rng.randint(4, 24)
    W = sum(col_w) + 2 * margin
    H = sum(row_h) + 2 * margin
    bg = rng.randint(240, 255)
    img = Image.new("RGB", (W, H), (bg, bg, bg))
    draw = ImageDraw.Draw(img)
    mask = np.zeros((H, W), np.uint8)

    xs = [margin]
    for w in col_w:
        xs.append(xs[-1] + w)
    ys = [margin]
    for h in row_h:
        ys.append(ys[-1] + h)

    # span layout: occupancy grid; a few rowspan/colspan merges
    owner = [[(r, c) for c in range(nc)] for r in range(nr)]
    spans: dict[tuple[int, int], tuple[int, int]] = {}
    # spans are the hard part of structure decoding (the head must count
    # crossed row/col boundaries): train with them often and plural
    if rng.random() < 0.8:
        for _ in range(rng.randint(1, 3)):
            r = rng.randrange(nr)
            c = rng.randrange(nc)
            if owner[r][c] != (r, c) or (r, c) in spans:
                continue
            if rng.random() < 0.5 and c + 1 < nc:  # colspan
                span = min(rng.randint(2, 3), nc - c)
                if any(owner[r][c + k] != (r, c + k) for k in range(span)):
                    continue
                for k in range(1, span):
                    owner[r][c + k] = (r, c)
                spans[(r, c)] = (1, span)
            elif r + 1 < nr:  # rowspan
                span = min(rng.randint(2, 3), nr - r)
                if any(owner[r + k][c] != (r + k, c) for k in range(span)):
                    continue
                for k in range(1, span):
                    owner[r + k][c] = (r, c)
                spans[(r, c)] = (span, 1)

    def cell_rect(r, c):
        rs, cs = spans.get((r, c), (1, 1))
        return xs[c], ys[r], xs[c + cs], ys[r + rs]

    line_col = (rng.randint(50, 130),) * 3
    lw = rng.choice([1, 1, 2])

    def put_line(x0, y0, x1, y1):
        draw.line([x0, y0, x1, y1], fill=line_col, width=lw)
        mask[max(0, y0 - lw // 2): y1 + lw // 2 + 1,
             max(0, x0 - lw // 2): x1 + lw // 2 + 1] = 1

    if wired:
        # draw each cell's rect edges (span-aware: no inner lines through
        # merged cells)
        for r in range(nr):
            for c in range(nc):
                if owner[r][c] != (r, c):
                    continue
                x0, y0, x1, y1 = cell_rect(r, c)
                put_line(x0, y0, x1, y0)
                put_line(x0, y1, x1, y1)
                put_line(x0, y0, x0, y1)
                put_line(x1, y0, x1, y1)
    else:
        put_line(xs[0], ys[0], xs[-1], ys[0])
        put_line(xs[0], ys[1], xs[-1], ys[1])  # under header
        put_line(xs[0], ys[-1], xs[-1], ys[-1])

    # cell text + token stream
    tokens: list[str] = []
    cell_boxes: list[tuple[float, float, float, float]] = []
    cell_texts: list[str] = []
    header_font = _font(rng, rng.randint(11, 15))
    body_font = _font(rng, rng.randint(10, 14))

    def emit_row(r):
        tokens.append("<tr>")
        for c in range(nc):
            if owner[r][c] != (r, c):
                continue
            rs, cs = spans.get((r, c), (1, 1))
            merged = rs > 1 or cs > 1
            x0, y0, x1, y1 = cell_rect(r, c)
            font = header_font if r == 0 else body_font
            # merged cells always carry text, typeset CENTERED in the
            # merged extent (real-world convention, and for wireless
            # tables the only visual evidence of the merge — top-left
            # placement makes a colspan indistinguishable from a cell
            # with empty neighbours)
            empty = (not merged) and rng.random() < 0.12
            text = "" if empty else random_text(rng, max_words=2)
            text, bbox = _truncate(text, font, x1 - x0 - 6)
            if text:
                if merged:
                    tw = bbox[2] - bbox[0]
                    th = bbox[3] - bbox[1]
                    tx = x0 + max(3, (x1 - x0 - tw) // 2)
                    ty = y0 + max(2, (y1 - y0 - th) // 2)
                else:
                    tx = x0 + 3
                    ty = y0 + 2
                draw.text((tx - bbox[0], ty - bbox[1]), text,
                          fill=(rng.randint(0, 90),) * 3, font=font)
            if rs == 1 and cs == 1:
                tokens.append("<td></td>")
            else:
                tokens.append("<td")
                if rs > 1:
                    tokens.append(f' rowspan="{rs}"')
                if cs > 1:
                    tokens.append(f' colspan="{cs}"')
                tokens.append(">")
                tokens.append("</td>")
            cell_boxes.append((x0, y0, x1, y1))
            cell_texts.append(text)

        tokens.append("</tr>")

    tokens.append("<thead>")
    emit_row(0)
    tokens.append("</thead>")
    tokens.append("<tbody>")
    for r in range(1, nr):
        emit_row(r)
    tokens.append("</tbody>")

    arr = np.asarray(img, np.uint8)
    if rng.random() < 0.3:
        noise = np.random.default_rng(rng.randrange(1 << 30)).normal(
            0, rng.random() * 6, arr.shape
        )
        arr = np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    return TableSample(
        img=arr, line_mask=mask, wired=wired, tokens=tokens,
        cell_boxes=cell_boxes, cell_texts=cell_texts, n_rows=nr, n_cols=nc,
    )


def slanet_sample(
    rng: random.Random, vocab, max_steps: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int] | None:
    """One teacher-forcing sample on the padded SLANet canvas.

    Returns (canvas uint8 (488,488,3), token_ids (max_steps,) int32
    padded with eos, loc (max_steps, 8) f32 normalized, loc_mask
    (max_steps,) f32, seq_len) or None when the structure exceeds the
    step budget.
    """
    s = render_table(rng, wired=rng.random() < 0.5)
    ids = [vocab.token_to_id[t] for t in s.tokens] + [vocab.eos_id]
    if len(ids) > max_steps:
        return None
    h, w = s.img.shape[:2]
    ratio = SLA_SIZE / max(h, w)
    rw, rh = max(1, int(w * ratio)), max(1, int(h * ratio))
    import cv2

    canvas = np.zeros((SLA_SIZE, SLA_SIZE, 3), np.uint8)
    canvas[:rh, :rw] = cv2.resize(s.img, (rw, rh))
    token_ids = np.full((max_steps,), vocab.eos_id, np.int32)
    token_ids[: len(ids)] = ids
    loc = np.zeros((max_steps, 8), np.float32)
    loc_mask = np.zeros((max_steps,), np.float32)
    cell_i = 0
    for t, tok in enumerate(s.tokens):
        if tok in ("<td></td>", "<td"):
            x0, y0, x1, y1 = s.cell_boxes[cell_i]
            cell_i += 1
            quad = np.array(
                [x0, y0, x1, y0, x1, y1, x0, y1], np.float32
            ) * ratio / SLA_SIZE
            loc[t] = quad
            loc_mask[t] = 1.0
    return canvas, token_ids, loc, loc_mask, len(ids)
