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
