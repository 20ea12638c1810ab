"""Enhanced reading order (xycut-plus-v3 counterpart)."""
import numpy as np


def _blk(x0, y0, x1, y1):
    return {"bbox": [x0, y0, x1, y1], "lines": []}


def test_two_column_order():
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    # page 600x800: title spans full width, then 2 columns of 3 blocks each
    title = _blk(50, 30, 550, 70)
    left = [_blk(50, 100 + i * 220, 280, 300 + i * 220) for i in range(3)]
    right = [_blk(320, 100 + i * 220, 550, 300 + i * 220) for i in range(3)]
    blocks = [right[1], left[0], title, right[0], left[2], right[2], left[1]]
    order = sort_blocks_v3(blocks, 600, 800)
    ordered = [blocks[i] for i in order]
    assert ordered[0] is title
    pos = {id(b): k for k, b in enumerate(ordered)}
    assert all(pos[id(a)] < pos[id(b)] for a, b in zip(left, left[1:]))
    assert all(pos[id(a)] < pos[id(b)] for a, b in zip(right, right[1:]))
    # full left column before right column
    assert pos[id(left[2])] < pos[id(right[0])]


def test_separator_bands():
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    # columns above AND below a full-width figure: band must reset columns
    fig = _blk(40, 380, 560, 430)
    top_l, top_r = _blk(50, 100, 280, 350), _blk(320, 100, 550, 350)
    bot_l, bot_r = _blk(50, 460, 280, 700), _blk(320, 460, 550, 700)
    blocks = [bot_r, top_r, fig, bot_l, top_l]
    order = sort_blocks_v3(blocks, 600, 800)
    names = {id(b): n for b, n in zip(
        blocks, ["bot_r", "top_r", "fig", "bot_l", "top_l"])}
    seq = [names[id(blocks[i])] for i in order]
    assert seq == ["top_l", "top_r", "fig", "bot_l", "bot_r"]


def test_virtual_lines_slender_not_split():
    from rapiddoc_tpu.reading_order.xycut_v3 import virtual_lines_for_block

    # slender sidebar stays whole; tall half-width block splits finely
    assert len(virtual_lines_for_block([0, 0, 50, 400], 12, 600, 800)) == 1
    fine = virtual_lines_for_block([0, 0, 250, 300], 12, 600, 800)
    assert len(fine) > 10


def test_v3_fallback_path():
    from rapiddoc_tpu.pipeline.page_build import sort_and_group_blocks

    blocks = [
        {"type": "text", "bbox": [50, 200, 550, 300]},
        {"type": "text", "bbox": [50, 50, 550, 150]},
    ]
    out = sort_and_group_blocks(blocks, 600, 800)
    assert out[0]["bbox"][1] == 50 and out[1]["bbox"][1] == 200


def test_figure_mid_column_does_not_break_column():
    """A figure inside the left column must not pull right-column blocks
    ahead of the remaining left-column text."""
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    left_top = _blk(50, 100, 280, 280)
    figure = _blk(60, 300, 270, 460)     # narrow figure inside left col
    left_bot = _blk(50, 480, 280, 700)
    right = [_blk(320, 100 + i * 210, 550, 290 + i * 210) for i in range(3)]
    blocks = [right[0], left_bot, figure, right[2], left_top, right[1]]
    order = sort_blocks_v3(blocks, 600, 800)
    pos = {id(blocks[i]): k for k, i in enumerate(order)}
    assert pos[id(left_top)] < pos[id(figure)] < pos[id(left_bot)]
    assert pos[id(left_bot)] < pos[id(right[0])]


def test_three_column_layout():
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    cols = []
    for c in range(3):
        x0 = 30 + c * 190
        cols.append([_blk(x0, 80 + r * 240, x0 + 160, 300 + r * 240)
                     for r in range(3)])
    blocks = [b for col in cols for b in col]
    import random

    rng = random.Random(0)
    shuffled = blocks[:]
    rng.shuffle(shuffled)
    order = sort_blocks_v3(shuffled, 600, 800)
    seq = [shuffled[i] for i in order]
    pos = {id(b): k for k, b in enumerate(seq)}
    for c in range(3):
        # within-column order
        for a, b in zip(cols[c], cols[c][1:]):
            assert pos[id(a)] < pos[id(b)]
        # whole column precedes the next
        if c < 2:
            assert pos[id(cols[c][-1])] < pos[id(cols[c + 1][0])]


# ------------------------------------------------------- label tiers (v3)

def _blk(x0, y0, x1, y1, label=None):
    b = {"bbox": [x0, y0, x1, y1]}
    if label:
        b["original_label"] = label
    return b


def test_headers_first_footers_last():
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    blocks = [
        _blk(50, 760, 550, 780, "footer"),     # bottom footer
        _blk(50, 100, 550, 200),               # body A
        _blk(50, 20, 550, 40, "header"),       # top header
        _blk(50, 220, 550, 320),               # body B
        _blk(400, 765, 550, 778, "footnote"),  # footnote
    ]
    order = sort_blocks_v3(blocks, 600, 800)
    labels = [blocks[i].get("original_label") for i in order]
    assert labels[0] == "header"
    assert set(labels[-2:]) == {"footer", "footnote"}
    # body keeps top-down order
    assert order.index(1) < order.index(3)


def test_doc_title_heads_its_band():
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    blocks = [
        _blk(50, 90, 300, 180),                  # left column text
        _blk(320, 90, 550, 180),                 # right column text
        _blk(120, 95, 480, 130, "doc_title"),    # title overlapping band
    ]
    order = sort_blocks_v3(blocks, 600, 800)
    assert order[0] == 2


def test_unordered_inserts_near_neighbor():
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    blocks = [
        _blk(50, 100, 550, 200),                   # body A (top)
        _blk(50, 400, 550, 500),                   # body B (bottom)
        _blk(555, 410, 590, 470, "aside_text"),    # margin note next to B
    ]
    order = sort_blocks_v3(blocks, 600, 800)
    assert order.index(2) == order.index(1) + 1  # right after body B


def test_order_edit_metric_on_tiered_page():
    """Wire the order-edit metric (tools/eval_quality.py) to the sorter:
    a page with footer/caption noise must reach 0 inversions."""
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3
    from rapiddoc_tpu.tools.eval_quality import order_inversion_rate

    blocks = [
        _blk(50, 20, 550, 40, "header"),
        _blk(50, 60, 550, 100),     # para 1
        _blk(50, 120, 290, 300),    # para 2 (left col)
        _blk(310, 120, 550, 300),   # para 3 (right col)
        _blk(50, 320, 550, 400),    # para 4
        _blk(50, 760, 550, 780, "footer"),
    ]
    texts = ["HEADER", "para one", "para two", "para three", "para four",
             "FOOTER"]
    order = sort_blocks_v3(blocks, 600, 800)
    pred = [texts[i] for i in order if blocks[i].get("original_label") is None]
    gt = ["para one", "para two", "para three", "para four"]
    assert order_inversion_rate(pred, gt) == 0.0


# ---------------------------------------------- region-model depth (r4)

def test_column_spanning_figure_cross_layout():
    """A figure spanning BOTH columns mid-page (not full content width)
    must not destroy the column cut: left column reads fully before the
    right column, and the figure inserts near its neighbors (reference
    get_layout_structure cross_layout handling, xycuts.py:271-371)."""
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    left_top = _blk(50, 100, 280, 300)
    left_bot = _blk(50, 480, 280, 700)
    right_top = _blk(320, 100, 550, 300)
    right_bot = _blk(320, 480, 550, 700)
    # spans x 150..450: bridges both columns, but < 0.86 content width
    figure = _blk(150, 330, 450, 450, "figure")
    blocks = [right_bot, figure, left_top, right_top, left_bot]
    order = sort_blocks_v3(blocks, 600, 800)
    pos = {id(blocks[i]): k for k, i in enumerate(order)}
    # columns stay intact despite the bridge
    assert pos[id(left_top)] < pos[id(left_bot)]
    assert pos[id(right_top)] < pos[id(right_bot)]
    assert pos[id(left_top)] < pos[id(right_top)]


def test_footer_first_detection_order():
    """Footers detected FIRST by the model (index 0) still sort last;
    headers detected last still sort first."""
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    blocks = [
        _blk(50, 770, 550, 790, "footer"),
        _blk(50, 120, 550, 300),
        _blk(50, 320, 550, 500),
        _blk(50, 15, 550, 35, "header"),
    ]
    order = sort_blocks_v3(blocks, 600, 800)
    assert order[0] == 3 and order[-1] == 0
    assert order.index(1) < order.index(2)


def test_gap_cut_on_column_structure_change():
    """A moderate vertical gap where the column structure changes (one
    column above, two below) must become a band cut (reference
    pre_process moderate-gap comparison, xycuts.py:160-205)."""
    from rapiddoc_tpu.reading_order.xycut_v3 import (
        Region,
        _pre_cut_bands,
    )

    single = _blk(50, 100, 550, 200)           # full-width paragraph
    left = _blk(50, 220, 280, 500)             # gap 20 > 1.2 * line_h(10)
    right = _blk(320, 220, 550, 500)
    blocks = [single, left, right]
    region = Region(blocks, 600, 800)
    bands = _pre_cut_bands(region, [0, 1, 2])
    assert [sorted(b) for b in bands] == [[0], [1, 2]]


def test_cross_reference_inserts_at_tail():
    """reference-labeled column spanners defer to the tail of the body
    (reference cross_reference -> reference_insert)."""
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    left = _blk(50, 100, 280, 600)
    right = _blk(320, 100, 550, 600)
    ref = _blk(150, 630, 450, 700, "reference")   # spans both columns
    blocks = [ref, right, left]
    order = sort_blocks_v3(blocks, 600, 800)
    assert order == [2, 1, 0]


def test_centered_heading_pre_cut():
    """A horizontally centered solo heading between two column sets
    separates the bands (reference pre_process centered-block cut)."""
    from rapiddoc_tpu.reading_order.xycut_v3 import sort_blocks_v3

    top_l, top_r = _blk(50, 80, 280, 300), _blk(320, 80, 550, 300)
    heading = _blk(200, 330, 400, 360)            # centered, solo
    bot_l, bot_r = _blk(50, 390, 280, 620), _blk(320, 390, 550, 620)
    blocks = [bot_r, heading, top_l, bot_l, top_r]
    order = sort_blocks_v3(blocks, 600, 800)
    pos = {id(blocks[i]): k for k, i in enumerate(order)}
    assert pos[id(top_l)] < pos[id(top_r)] < pos[id(heading)]
    assert pos[id(heading)] < pos[id(bot_l)] < pos[id(bot_r)]
