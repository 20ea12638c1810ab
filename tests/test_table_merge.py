"""Cross-page table merge: reference semantics (header-row matching,
rowspan-aware continuation, continuation captions, non-merges)."""
from rapiddoc_tpu.pipeline.table_merge import (
    cross_page_table_merge,
    detect_header_rows,
    expand_header_by_rowspan,
    parse_rows,
    scan_rows,
)
from rapiddoc_tpu.types import BlockType, ContentType, SplitFlag


def table_block(html, bbox=(50, 600, 550, 780), caption=None, footnote=None):
    blocks = [
        {
            "type": BlockType.TABLE_BODY,
            "bbox": list(bbox),
            "lines": [
                {
                    "bbox": list(bbox),
                    "spans": [
                        {"type": ContentType.TABLE, "bbox": list(bbox),
                         "html": html}
                    ],
                }
            ],
        }
    ]
    if caption is not None:
        blocks.insert(0, {
            "type": BlockType.TABLE_CAPTION,
            "bbox": [bbox[0], bbox[1] - 20, bbox[2], bbox[1]],
            "lines": [{"bbox": list(bbox), "spans": [
                {"type": ContentType.TEXT, "content": caption,
                 "bbox": list(bbox)}]}],
        })
    if footnote is not None:
        blocks.append({
            "type": BlockType.TABLE_FOOTNOTE,
            "bbox": [bbox[0], bbox[3], bbox[2], bbox[3] + 20],
            "lines": [{"bbox": list(bbox), "spans": [
                {"type": ContentType.TEXT, "content": footnote,
                 "bbox": list(bbox)}]}],
        })
    return {"type": BlockType.TABLE, "bbox": list(bbox), "blocks": blocks}


def pages(prev_block, next_block):
    return [
        {"para_blocks": [prev_block]},
        {"para_blocks": [next_block]},
    ]


def html_of(block):
    for sub in block["blocks"]:
        if sub["type"] == BlockType.TABLE_BODY:
            return sub["lines"][0]["spans"][0]["html"]
    return None


HEADER = "<tr><td>Name</td><td>Qty</td><td>Price</td></tr>"
T1 = (
    "<table><tbody>" + HEADER
    + "<tr><td>apple</td><td>1</td><td>2.0</td></tr></tbody></table>"
)
T2 = (
    "<table><tbody>" + HEADER
    + "<tr><td>pear</td><td>4</td><td>5.0</td></tr>"
    + "<tr><td>plum</td><td>6</td><td>7.0</td></tr></tbody></table>"
)


def test_continuation_merges_and_drops_repeated_header():
    a, b = table_block(T1), table_block(T2)
    pg = pages(a, b)
    cross_page_table_merge(pg)
    merged = html_of(a)
    assert merged.count("Name") == 1  # repeated header dropped
    assert "pear" in merged and "plum" in merged
    assert pg[1]["para_blocks"] == []
    assert b[SplitFlag.LINES_DELETED] is True


def test_rowspan_continuation_merges():
    # prev ends in a rowspan group; the continuation page re-emits a full
    # 3-column first data row (what structure models produce) — total
    # columns agree through the rowspan-aware occupancy scan
    prev = table_block(
        "<table><tbody>" + HEADER
        + '<tr><td rowspan="2">group</td><td>1</td><td>2</td></tr>'
        "<tr><td>1b</td><td>2b</td></tr>"
        "</tbody></table>"
    )
    nxt = table_block(
        "<table><tbody>"
        '<tr><td rowspan="2">group2</td><td>3</td><td>4</td></tr>'
        "<tr><td>5</td><td>6</td></tr></tbody></table>"
    )
    pg = pages(prev, nxt)
    cross_page_table_merge(pg)
    merged = html_of(prev)
    assert "5" in merged and "group2" in merged
    assert 'rowspan="2">group2' in merged  # spans survive re-serialization
    assert pg[1]["para_blocks"] == []


def test_three_page_chain_collapses_to_first():
    a, b, c = table_block(T1), table_block(T2), table_block(
        "<table><tbody>" + HEADER
        + "<tr><td>kiwi</td><td>8</td><td>9.0</td></tr></tbody></table>"
    )
    pg = [
        {"para_blocks": [a]},
        {"para_blocks": [b]},
        {"para_blocks": [c]},
    ]
    cross_page_table_merge(pg)
    merged = html_of(a)
    assert "pear" in merged and "kiwi" in merged
    assert merged.count("Name") == 1
    assert pg[1]["para_blocks"] == [] and pg[2]["para_blocks"] == []


def test_unrelated_same_width_tables_do_not_merge():
    # second table announces itself with its own (non-continuation) caption
    a = table_block(T1)
    b = table_block(T2, caption="Table 7: another dataset")
    pg = pages(a, b)
    cross_page_table_merge(pg)
    assert "pear" not in html_of(a)
    assert pg[1]["para_blocks"] == [b]


def test_continuation_caption_marker_allows_merge():
    a = table_block(T1)
    b = table_block(T2, caption="Table 6 (continued)")
    pg = pages(a, b)
    cross_page_table_merge(pg)
    assert "pear" in html_of(a)


def test_footnoted_table_does_not_absorb_next():
    a = table_block(T1, footnote="* preliminary values")
    b = table_block(T2)
    pg = pages(a, b)
    cross_page_table_merge(pg)
    assert "pear" not in html_of(a)


def test_width_mismatch_blocks_merge():
    a = table_block(T1, bbox=(50, 600, 550, 780))
    b = table_block(T2, bbox=(50, 600, 300, 780))  # much narrower
    pg = pages(a, b)
    cross_page_table_merge(pg)
    assert "pear" not in html_of(a)


def test_column_count_mismatch_blocks_merge():
    b = table_block(
        "<table><tbody><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></tbody></table>"
    )
    a = table_block(T1)
    pg = pages(a, b)
    cross_page_table_merge(pg)
    assert "a</td>" not in html_of(a)


def test_footnotes_carry_over_on_merge():
    a = table_block(T1)
    b = table_block(T2, footnote="* carried note")
    pg = pages(a, b)
    cross_page_table_merge(pg)
    notes = [
        blk for blk in a["blocks"] if blk["type"] == BlockType.TABLE_FOOTNOTE
    ]
    assert len(notes) == 1 and notes[0].get(SplitFlag.CROSS_PAGE) is True


def test_scan_rows_rowspan_occupancy():
    rows = parse_rows(
        '<table><tr><td rowspan="2">a</td><td>b</td></tr>'
        "<tr><td>c</td></tr></table>"
    )
    metrics, total = scan_rows(rows)
    assert total == 2
    assert metrics[0] == (2, 2, 2)
    assert metrics[1][0] == 2  # effective cols include the rowspan carry
    assert metrics[1][1] == 1  # one actual cell


def test_header_detection_with_rowspan_expansion():
    h2 = (
        '<tr><td rowspan="2">Name</td><td colspan="2">Values</td></tr>'
        "<tr><td>Min</td><td>Max</td></tr>"
    )
    prev = parse_rows("<table>" + h2 + "<tr><td>x</td><td>1</td><td>2</td></tr></table>")
    cur = parse_rows("<table>" + h2 + "<tr><td>y</td><td>3</td><td>4</td></tr></table>")
    pm, _ = scan_rows(prev)
    cm, _ = scan_rows(cur)
    n = detect_header_rows(prev, pm, cur, cm)
    assert n == 2
    assert expand_header_by_rowspan(cur, 1) == 2


# ---- round-4 reference-parity refinements ----------------------------------

def test_rendered_segments_boundary_enables_merge_with_colspan_surgery():
    # prev's last row is 2 visual segments (colspan 2 + 1) over a 3-col
    # table; the continuation is a plain 2-col table. Effective (3 vs 2)
    # and actual (3 vs 2) cols disagree, but rendered segments agree
    # (2 == 2) -> merge, then colspan surgery widens the continuation
    # rows to 3 columns by copying the boundary row's span structure.
    a = table_block(
        "<table><tbody>" + HEADER
        + '<tr><td colspan="2">subtotal</td><td>9</td></tr></tbody></table>'
    )
    b = table_block(
        "<table><tbody><tr><td>frob</td><td>10</td></tr>"
        "<tr><td>knob</td><td>11</td></tr></tbody></table>"
    )
    pg = pages(a, b)
    cross_page_table_merge(pg)
    merged = html_of(a)
    assert "frob" in merged and "knob" in merged
    assert 'colspan="2">frob' in merged
    assert 'colspan="2">knob' in merged
    assert pg[1]["para_blocks"] == []


def test_cell_merge_hint_partial_transfers_and_keeps_row():
    a = table_block(T1)
    b = table_block(
        "<table><tbody><tr><td>sauce</td><td>3</td><td>4.0</td></tr>"
        "<tr><td>fig</td><td>5</td><td>6.0</td></tr></tbody></table>"
    )
    b["cell_merge"] = [1, 0, 0]
    pg = pages(a, b)
    cross_page_table_merge(pg)
    merged = html_of(a)
    # continuation cell 0 content appended into prev last-row cell 0
    assert "applesauce" in merged
    # the source cell was cleared but its row (3 and 4.0) survives
    assert merged.count("sauce") == 1
    assert ">3<" in merged and ">4.0<" in merged


def test_cell_merge_hint_full_row_is_dropped():
    a = table_block(T1)
    b = table_block(
        "<table><tbody><tr><td>sauce</td><td>2</td><td>.5</td></tr>"
        "<tr><td>fig</td><td>5</td><td>6.0</td></tr></tbody></table>"
    )
    b["cell_merge"] = [1, 1, 1]
    pg = pages(a, b)
    cross_page_table_merge(pg)
    merged = html_of(a)
    assert "applesauce" in merged and "12" in merged and "2.0.5" in merged
    assert "fig" in merged
    # the fully-absorbed row is gone: header + apple row + fig row only
    assert merged.count("<tr>") == 3


def test_post_table_caption_does_not_block_and_is_restored_as_text():
    a = table_block(T1)
    b = table_block(T2, bbox=(50, 100, 550, 300))
    # a mis-attached caption BELOW the table body, no continuation marker
    b["blocks"].append({
        "type": BlockType.TABLE_CAPTION,
        "bbox": [50, 320, 550, 340],
        "lines": [{"bbox": [50, 320, 550, 340], "spans": [
            {"type": ContentType.TEXT, "content": "4.2 Discussion",
             "bbox": [50, 320, 550, 340]}]}],
    })
    pg = pages(a, b)
    cross_page_table_merge(pg)
    assert "pear" in html_of(a)  # merge went through
    restored = pg[1]["para_blocks"]
    assert len(restored) == 1 and restored[0]["type"] == BlockType.TEXT
    texts = [
        s.get("content")
        for line in restored[0]["lines"] for s in line["spans"]
    ]
    assert "4.2 Discussion" in texts


def test_inline_markup_in_continuation_cells_survives_merge():
    a = table_block(T1)
    b = table_block(
        "<table><tbody>" + HEADER
        + "<tr><td><b>pear</b></td><td>4</td>"
        '<td><img src="chart.png"/></td></tr></tbody></table>'
    )
    pg = pages(a, b)
    cross_page_table_merge(pg)
    merged = html_of(a)
    assert "<b>pear</b>" in merged
    assert '<img src="chart.png"' in merged
