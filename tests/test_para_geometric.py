"""Geometric para_split behaviors (reference para_split.py parity)."""
from rapiddoc_tpu.pipeline.para import classify_text_block, para_split
from rapiddoc_tpu.types import BlockType, SplitFlag


def _line(x0, y0, x1, y1, text):
    return {"bbox": [x0, y0, x1, y1],
            "spans": [{"content": text, "type": "text",
                       "bbox": [x0, y0, x1, y1]}]}


def _block(lines, btype=BlockType.TEXT):
    bbox = [min(l["bbox"][0] for l in lines), min(l["bbox"][1] for l in lines),
            max(l["bbox"][2] for l in lines), max(l["bbox"][3] for l in lines)]
    return {"type": btype, "bbox": bbox, "bbox_fs": list(bbox), "lines": lines}


def test_classify_dogtooth_list():
    # flush-left lines with ragged right edges -> LIST
    lines = [
        _line(50, 100 + i * 20, 50 + w, 114 + i * 20, t)
        for i, (w, t) in enumerate(
            [(400, "first item text here"), (250, "second short"),
             (420, "third item is rather longer"), (180, "fourth")]
        )
    ]
    b = _block(lines)
    assert classify_text_block(b, (600, 800)) == BlockType.LIST


def test_classify_index_block():
    # left and right flush with numeric line ends -> INDEX (TOC)
    lines = [
        _line(50, 100 + i * 20, 450, 114 + i * 20, f"Chapter {i} ....... {i*7+3}")
        for i in range(5)
    ]
    b = _block(lines)
    assert classify_text_block(b, (600, 800)) == BlockType.INDEX


def test_classify_plain_paragraph():
    lines = [
        _line(50, 100, 450, 114, "This is a full width line of text that"),
        _line(50, 120, 450, 134, "continues to the right edge exactly and"),
        _line(50, 140, 430, 154, "ends with a period."),
    ]
    b = _block(lines)
    assert classify_text_block(b, (600, 800)) == BlockType.TEXT


def test_cross_page_paragraph_merge():
    prev = _block([
        _line(50, 640, 450, 654, "a paragraph with enough lines that"),
        _line(50, 660, 450, 674, "the group does not look like a list"),
        _line(50, 680, 450, 694, "of short items, so text merging"),
        _line(50, 700, 430, 714, "applies normally."),
    ])
    prev2 = _block([
        _line(50, 720, 450, 734, "second block keeps going and the end has no stop"),
    ])
    nxt = _block([
        _line(50, 60, 450, 74, "trailing punctuation on this page,"),
        _line(50, 80, 300, 94, "so it merges upward."),
    ])
    pages = [
        {"page_idx": 0, "page_size": [600, 800],
         "preproc_blocks": [prev, prev2]},
        {"page_idx": 1, "page_size": [600, 800], "preproc_blocks": [nxt]},
    ]
    para_split(pages)
    assert nxt.get(SplitFlag.LINES_DELETED) is True
    assert pages[1]["para_blocks"] == []
    # moved spans are flagged cross-page
    moved = [s for l in prev2["lines"][1:] for s in l["spans"]]
    assert moved and all(s.get(SplitFlag.CROSS_PAGE) for s in moved)


def test_new_sentence_does_not_merge():
    prev = _block([
        _line(50, 680, 450, 694, "some text in the first line here"),
        _line(50, 700, 430, 714, "and this paragraph clearly ends."),
    ])
    nxt = _block([
        _line(50, 60, 450, 74, "A new paragraph starts with a capital"),
        _line(50, 80, 300, 94, "letter on the next page."),
    ])
    pages = [
        {"page_idx": 0, "page_size": [600, 800], "preproc_blocks": [prev]},
        {"page_idx": 1, "page_size": [600, 800], "preproc_blocks": [nxt]},
    ]
    para_split(pages)
    assert not nxt.get(SplitFlag.LINES_DELETED)
    assert pages[1]["para_blocks"] == [nxt]
