"""RAG chunker: markdown-structure-aware text splitting.

Role parity with the reference chunker (reference:
rapid_doc/chunker/text_splitters.py:43-564 — heading-scoped chunks,
HTML-table-aware splitting that repeats the header row, configurable
size/overlap; get_bbox_page_fast.py chunk->bbox back-mapping).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_TABLE_RE = re.compile(r"<table.*?</table>", re.S | re.I)
_TR_RE = re.compile(r"<tr[^>]*>.*?</tr>", re.S | re.I)


@dataclass
class Chunk:
    text: str
    headings: list[str] = field(default_factory=list)
    start_line: int = 0
    end_line: int = 0

    def with_context(self) -> str:
        if not self.headings:
            return self.text
        return " > ".join(self.headings) + "\n\n" + self.text


def _split_table(table_html: str, max_chars: int) -> list[str]:
    """Split a long HTML table into row groups, repeating the header row."""
    rows = _TR_RE.findall(table_html)
    if not rows:
        return [table_html]
    header = rows[0] if re.search(r"<th", rows[0], re.I) or len(rows) > 2 else ""
    body = rows[1:] if header else rows
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = len(header)
    for row in body:
        if cur and cur_len + len(row) > max_chars:
            chunks.append("<table>" + header + "".join(cur) + "</table>")
            cur, cur_len = [], len(header)
        cur.append(row)
        cur_len += len(row)
    if cur:
        chunks.append("<table>" + header + "".join(cur) + "</table>")
    return chunks


def split_markdown(
    markdown: str,
    max_chars: int = 1600,
    overlap_chars: int = 200,
) -> list[Chunk]:
    """Heading-aware chunks bounded by max_chars with paragraph overlap."""
    lines = markdown.split("\n")
    heading_stack: list[tuple[int, str]] = []
    chunks: list[Chunk] = []
    buffer: list[str] = []
    buf_start = 0

    def current_headings() -> list[str]:
        return [h for _, h in heading_stack]

    def flush(end_line: int) -> None:
        nonlocal buffer, buf_start
        text = "\n".join(buffer).strip()
        if text:
            # oversized paragraphs/tables are split further
            if len(text) > max_chars:
                for piece in _split_oversized(text, max_chars, overlap_chars):
                    chunks.append(
                        Chunk(piece, current_headings(), buf_start, end_line)
                    )
            else:
                chunks.append(Chunk(text, current_headings(), buf_start, end_line))
        buffer = []
        buf_start = end_line + 1

    i = 0
    while i < len(lines):
        line = lines[i]
        m = _HEADING_RE.match(line)
        if m:
            flush(i - 1)
            level = len(m.group(1))
            while heading_stack and heading_stack[-1][0] >= level:
                heading_stack.pop()
            heading_stack.append((level, m.group(2).strip()))
            buf_start = i + 1
        else:
            candidate_len = sum(len(ln) + 1 for ln in buffer) + len(line)
            if candidate_len > max_chars and buffer:
                flush(i - 1)
            buffer.append(line)
        i += 1
    flush(len(lines) - 1)
    return [c for c in chunks if c.text.strip()]


def _split_oversized(text: str, max_chars: int, overlap: int) -> list[str]:
    tables = _TABLE_RE.findall(text)
    if tables:
        pieces: list[str] = []
        rest = text
        for tbl in tables:
            before, rest = rest.split(tbl, 1)
            if before.strip():
                pieces.extend(_split_plain(before.strip(), max_chars, overlap))
            pieces.extend(_split_table(tbl, max_chars))
        if rest.strip():
            pieces.extend(_split_plain(rest.strip(), max_chars, overlap))
        return pieces
    return _split_plain(text, max_chars, overlap)


def _split_plain(text: str, max_chars: int, overlap: int) -> list[str]:
    sentences = re.split(r"(?<=[.!?。！？])\s+", text)
    out: list[str] = []
    cur = ""
    for s in sentences:
        if cur and len(cur) + len(s) + 1 > max_chars:
            out.append(cur.strip())
            cur = cur[-overlap:] if overlap else ""
        cur = (cur + " " + s).strip()
    if cur.strip():
        out.append(cur.strip())
    return out


def chunk_with_bboxes(
    markdown: str, content_list: list[dict], max_chars: int = 1600
) -> list[dict]:
    """Chunks + the source bboxes/pages whose text they contain
    (reference: chunker/get_bbox_page_fast.py)."""
    chunks = split_markdown(markdown, max_chars=max_chars)
    out = []
    for chunk in chunks:
        refs = []
        probe = re.sub(r"\s+", "", chunk.text)[:600]
        for item in content_list:
            text = re.sub(r"\s+", "", item.get("text", "") or item.get("table_body", "") or "")
            if not text:
                continue
            sample = text[:80]
            if sample and sample in probe:
                refs.append(
                    {"page_idx": item.get("page_idx"), "bbox": item.get("bbox")}
                )
        out.append(
            {
                "text": chunk.with_context(),
                "headings": chunk.headings,
                "refs": refs,
            }
        )
    return out
