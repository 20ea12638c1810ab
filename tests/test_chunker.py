"""RAG chunker: heading context, table-aware splitting, bbox mapping."""


def _table(n_rows: int) -> str:
    rows = "".join(
        f"<tr><td>cell {i} with some padding text</td></tr>"
        for i in range(n_rows)
    )
    return f"<table>{rows}</table>"


def test_split_markdown_heading_context():
    from rapiddoc_tpu.chunker.text_splitters import split_markdown

    md = ("# Title\n\n## Section A\n\n" + "alpha " * 120 +
          "\n\n## Section B\n\n" + "beta " * 120)
    chunks = split_markdown(md, max_chars=400)
    assert len(chunks) >= 2
    a = next(c for c in chunks if "alpha" in c.text)
    b = next(c for c in chunks if "beta" in c.text)
    assert "Section A" in a.with_context()
    assert "Section B" in b.with_context()


def test_oversized_table_splits_by_rows():
    from rapiddoc_tpu.chunker.text_splitters import split_markdown

    md = "intro paragraph\n\n" + _table(60)
    chunks = split_markdown(md, max_chars=600)
    table_chunks = [c for c in chunks if "<table" in c.text.lower()]
    assert len(table_chunks) >= 2
    # every table chunk is well-formed
    for c in table_chunks:
        assert c.text.count("<tr>") >= 1
        assert "</table>" in c.text


def test_chunk_bbox_backmap():
    from rapiddoc_tpu.chunker.text_splitters import chunk_with_bboxes

    content_list = [
        {"type": "text", "text": "first paragraph of the document",
         "bbox": [10, 10, 500, 40], "page_idx": 0},
        {"type": "text", "text": "second paragraph follows here",
         "bbox": [10, 60, 500, 90], "page_idx": 0},
        {"type": "text", "text": "third paragraph on another page",
         "bbox": [10, 10, 500, 40], "page_idx": 1},
    ]
    md = "\n\n".join(c["text"] for c in content_list)
    chunks = chunk_with_bboxes(md, content_list, max_chars=70)
    assert chunks
    for ch in chunks:
        assert ch["refs"], "every chunk maps back to source boxes"
        for ref in ch["refs"]:
            assert "page_idx" in ref and "bbox" in ref


def _middle_json_two_pages():
    """Minimal middle-json with span-level bboxes across two pages."""
    def block(texts, y0):
        return {
            "type": "text",
            "bbox": [10, y0, 500, y0 + 30],
            "lines": [
                {
                    "bbox": [10, y0, 500, y0 + 30],
                    "spans": [
                        {"type": "text", "content": t,
                         "bbox": [10 + 120 * i, y0, 120 + 120 * i, y0 + 30]}
                        for i, t in enumerate(texts)
                    ],
                }
            ],
        }

    return {
        "pdf_info": [
            {"preproc_blocks": [
                block(["Alpha begins the document ", "and continues"], 10),
                block(["Second block on page one"], 60),
            ]},
            {"preproc_blocks": [
                block(["Third block opens page two"], 10),
            ]},
        ]
    }


def test_chunk_bbox_backmap_span_level_middle_json():
    """middle_json source -> SPAN-level refs with exact char-offset
    matching across pages (reference: get_bbox_page_fast.py block-level
    mapping; spans carry their own bboxes here)."""
    from rapiddoc_tpu.chunker.text_splitters import chunk_with_bboxes

    middle = _middle_json_two_pages()
    md = ("Alpha begins the document and continues\n\n"
          "Second block on page one\n\n"
          "Third block opens page two")
    chunks = chunk_with_bboxes(md, middle, max_chars=45)
    assert len(chunks) >= 2
    # every chunk resolves to at least one span ref with page + bbox
    for ch in chunks:
        assert ch["refs"], ch["text"]
        for ref in ch["refs"]:
            assert ref["bbox"] is not None
    # the page-two chunk points at page 1
    p2 = next(c for c in chunks if "page two" in c["text"])
    assert all(r["page_idx"] == 1 for r in p2["refs"])
    # the first chunk covers BOTH spans of the first block (span-level)
    p0 = next(c for c in chunks if "Alpha" in c["text"])
    assert len(p0["refs"]) >= 2
    # reference positional format [page, x0, x1, y0, y1]
    for pos in p0["positions"]:
        page, x0, x1, y0, y1 = pos
        assert x1 > x0 and y1 > y0


def test_chunk_bbox_backmap_fuzzy_fallback():
    """Reformatted chunk text (exact match impossible) still attributes
    via the similarity anchor + contiguous expansion walk (reference:
    get_bbox_page_fast.py:40-117)."""
    from rapiddoc_tpu.chunker.text_splitters import chunk_with_bboxes

    content_list = [
        {"type": "text", "text": "The quick brown fox jumps over the dog",
         "bbox": [0, 0, 10, 10], "page_idx": 0},
        {"type": "text", "text": "An entirely different paragraph here",
         "bbox": [0, 20, 10, 30], "page_idx": 0},
    ]
    # md text diverges (typo + extra words): no exact normalized match
    md = "The quick browwn fox jumps over the lazy dog indeed"
    chunks = chunk_with_bboxes(md, content_list, max_chars=400)
    assert chunks[0]["refs"]
    assert chunks[0]["refs"][0]["bbox"] == [0, 0, 10, 10]


def test_markdown_text_splitter_token_api():
    """Reference-parity class API: token budgets, min chunk floor,
    heading context stack, oversize-table row splitting."""
    from rapiddoc_tpu.chunker.text_splitters import (
        MarkdownTextSplitter,
        num_tokens_from_string,
    )

    md = (
        "# Doc\n\n## Part 1\n\n" + ("word " * 700) + "\n\n## Part 2\n\n"
        + ("data " * 700)
    )
    sp = MarkdownTextSplitter(chunk_token_num=256, min_chunk_tokens=10)
    chunks = sp.split_text(md)
    assert len(chunks) >= 4
    for c in chunks:
        # force-split cap: max_tokens defaults to 2x budget
        assert num_tokens_from_string(c) <= 512 + 8

    # giant html table: split by rows, each piece a wellformed table
    table = "<table><tr><th>h</th></tr>" + "".join(
        f"<tr><td>{'cell ' * 40}{i}</td></tr>" for i in range(80)
    ) + "</table>"
    sp2 = MarkdownTextSplitter(chunk_token_num=64, min_chunk_tokens=4,
                               max_table_tokens=600)
    pieces = [c for c in sp2.split_text("intro\n\n" + table) if "<table" in c]
    assert len(pieces) >= 2
    for p in pieces:
        assert p.count("<table") == p.count("</table>") == 1
        assert "<th>h</th>" in p  # header repeated


def test_parse_blocks_char_offsets():
    """Every parsed block's char range reproduces its text exactly."""
    from rapiddoc_tpu.chunker.text_splitters import parse_blocks

    md = ("# Title\n\npara text here\n\n- item one\n- item two\n\n"
          "> a quote\n\n```py\ncode()\n```\n\n<table><tr><td>x</td></tr>"
          "\n</table>\n\ntail paragraph")
    blocks = parse_blocks(md)
    kinds = [b.kind for b in blocks]
    assert kinds == ["heading", "paragraph", "list", "quote", "code",
                     "table", "paragraph"]
    for b in blocks:
        assert md[b.start:b.end] == b.text


def test_oversize_table_continuation_chunks_keep_refs():
    """Segments 2..N of a split oversize table come from ONE source
    unit; every segment must still carry that unit's bbox ref (round-5
    review finding: the matched-unit exclusion left them empty)."""
    from rapiddoc_tpu.chunker.text_splitters import chunk_with_bboxes

    rows = "".join(
        f"<tr><td>row {i} with a fair amount of cell text</td></tr>"
        for i in range(30)
    )
    table = f"<table><tr><th>head</th></tr>{rows}</table>"
    content_list = [
        {"type": "table", "table_body": table,
         "bbox": [5, 5, 500, 700], "page_idx": 2},
    ]
    chunks = chunk_with_bboxes(table, content_list, max_chars=400)
    table_chunks = [c for c in chunks if "<table" in c["text"]]
    assert len(table_chunks) >= 2  # actually split
    for ch in table_chunks:
        assert ch["refs"], ch["text"][:60]
        assert ch["refs"][0]["page_idx"] == 2
