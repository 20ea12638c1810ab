"""Cross-page table merging with reference semantics.

Behavioral counterpart of the reference engine (reference:
rapid_doc/backend/utils/utils.py:14 cross_page_table_merge +
rapid_doc/utils/table_merge.py): the last table of page N merges with the
first table of page N+1 when
  - the continuation has no caption, or its caption carries a
    continuation marker ("续表", "(continued)", ... — table_merge.py:13-26);
  - the previous table has no footnote (unless continuation-marked);
  - the two tables have similar width (<10% difference);
  - their column structure matches: same total columns, or the boundary
    rows agree on effective/actual columns, computed with a rowspan-aware
    occupancy scan (table_merge.py:85-155) so a cell spanning the page
    break still matches;
  - repeated header rows on the continuation (matched structurally by
    cell texts/colspans/rowspans over the first <=5 rows, with a visual
    text-only fallback and rowspan expansion — table_merge.py:483-571)
    are dropped before appending.
Merged-away blocks get SplitFlag.LINES_DELETED, footnotes carry over as
cross-page blocks, exactly like perform_table_merge (:857-949).
"""
from __future__ import annotations

import re
from html.parser import HTMLParser

from ..types import BlockType, ContentType, SplitFlag

CONTINUATION_END_MARKERS = [
    "(续)", "(续表)", "(续上表)", "(continued)", "(cont.)", "(cont’d)",
    "(…continued)", "续表",
]
CONTINUATION_INLINE_MARKERS = ["(continued)"]
MAX_HEADER_ROWS = 5


class _Cell:
    __slots__ = ("text", "colspan", "rowspan", "html")

    def __init__(self, text: str, colspan: int, rowspan: int, html: str):
        self.text = text
        self.colspan = colspan
        self.rowspan = rowspan
        self.html = html


class _TableParser(HTMLParser):
    """html -> rows of _Cell (+ raw row html for re-serialization)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.rows: list[list[_Cell]] = []
        self._cur_row: list[_Cell] | None = None
        self._cell_attrs: dict | None = None
        self._cell_tag = "td"
        self._cell_text: list[str] = []
        self._cell_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag == "tr":
            self._cur_row = []
        elif tag in ("td", "th"):
            if self._cell_depth == 0:
                self._cell_attrs = dict(attrs)
                self._cell_tag = tag
                self._cell_text = []
            self._cell_depth += 1

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell_depth > 0:
            self._cell_depth -= 1
            if self._cell_depth == 0 and self._cur_row is not None:
                a = self._cell_attrs or {}

                def _int(v):
                    try:
                        return max(1, int(v))
                    except (TypeError, ValueError):
                        return 1

                attrs_html = "".join(
                    f' {k}="{v}"' for k, v in a.items() if v is not None
                )
                text = "".join(self._cell_text)
                t = self._cell_tag
                self._cur_row.append(
                    _Cell(
                        text.strip(),
                        _int(a.get("colspan")),
                        _int(a.get("rowspan")),
                        f"<{t}{attrs_html}>{text}</{t}>",
                    )
                )
        elif tag == "tr" and self._cur_row is not None:
            self.rows.append(self._cur_row)
            self._cur_row = None

    def handle_data(self, data):
        if self._cell_depth > 0:
            self._cell_text.append(data)


def parse_rows(html: str) -> list[list[_Cell]]:
    p = _TableParser()
    try:
        p.feed(html)
    except Exception:
        return []
    return p.rows


def scan_rows(rows: list[list[_Cell]]):
    """Rowspan-aware occupancy scan -> (per-row metrics, total_cols).

    metrics per row: (effective_cols, actual_cols, visual_cols)."""
    occupied: dict[int, set[int]] = {}
    max_cols = 0
    metrics: list[tuple[int, int, int]] = []
    for ridx, row in enumerate(rows):
        occ = occupied.setdefault(ridx, set())
        col = 0
        actual = 0
        for cell in row:
            while col in occ:
                col += 1
            actual += cell.colspan
            for ro in range(cell.rowspan):
                tgt = occupied.setdefault(ridx + ro, set())
                tgt.update(range(col, col + cell.colspan))
            col += cell.colspan
            max_cols = max(max_cols, col)
        eff = max(occ) + 1 if occ else 0
        max_cols = max(max_cols, eff)
        metrics.append((eff, actual, len(row)))
    return metrics, max_cols


def _norm_text(s: str) -> str:
    return re.sub(r"\s+", "", s).lower()


def _row_signature(row: list[_Cell], eff: int):
    return (
        len(row),
        eff,
        tuple(c.colspan for c in row),
        tuple(c.rowspan for c in row),
        tuple(_norm_text(c.text) for c in row),
    )


def detect_header_rows(
    prev_rows, prev_metrics, cur_rows, cur_metrics,
    max_header_rows: int = MAX_HEADER_ROWS,
) -> int:
    """Leading rows of the continuation that repeat the previous table's
    header (structural match first, text-only visual fallback)."""
    n = min(len(prev_rows), len(cur_rows), max_header_rows)
    count = 0
    for i in range(n):
        if _row_signature(prev_rows[i], prev_metrics[i][0]) == _row_signature(
            cur_rows[i], cur_metrics[i][0]
        ):
            count += 1
        else:
            break
    if count == 0:
        for i in range(n):
            same_texts = tuple(_norm_text(c.text) for c in prev_rows[i]) == tuple(
                _norm_text(c.text) for c in cur_rows[i]
            )
            if same_texts and prev_metrics[i][0] == cur_metrics[i][0]:
                count += 1
            else:
                break
    return count


def expand_header_by_rowspan(rows, header_count: int) -> int:
    """A skipped header row's rowspan must take its covered rows along
    (reference: _expand_header_count_by_rowspan)."""
    if header_count <= 0 or not rows:
        return header_count
    expanded = min(header_count, len(rows))
    i = 0
    while i < expanded:
        for cell in rows[i]:
            if cell.rowspan > 1:
                expanded = min(max(expanded, i + cell.rowspan), len(rows))
        i += 1
    return expanded


# --------------------------------------------------------------- block glue


def _table_html(block: dict) -> str | None:
    for sub in block.get("blocks", []):
        if sub["type"] == BlockType.TABLE_BODY:
            for line in sub.get("lines", []):
                for span in line.get("spans", []):
                    if span.get("type") == ContentType.TABLE and span.get("html"):
                        return span["html"]
    return None


def _set_table_html(block: dict, html: str) -> None:
    for sub in block.get("blocks", []):
        if sub["type"] == BlockType.TABLE_BODY:
            for line in sub.get("lines", []):
                for span in line.get("spans", []):
                    if span.get("type") == ContentType.TABLE:
                        span["html"] = html
                        return


def _caption_text(block: dict) -> str:
    parts = []
    for line in block.get("lines", []):
        for span in line.get("spans", []):
            if span.get("content"):
                parts.append(span["content"])
    return "".join(parts)


def _is_continuation_caption(caption_block: dict) -> bool:
    from .mkcontent import _full_to_half

    text = _full_to_half(_caption_text(caption_block).strip()).lower()
    return any(
        text.endswith(m.lower()) for m in CONTINUATION_END_MARKERS
    ) or any(m.lower() in text for m in CONTINUATION_INLINE_MARKERS)


def _can_merge(prev_block: dict, cur_block: dict) -> bool:
    captions = [
        b
        for b in cur_block.get("blocks", [])
        if b["type"] == BlockType.TABLE_CAPTION and b.get("lines")
    ]
    footnotes = sum(
        1
        for b in prev_block.get("blocks", [])
        if b["type"] == BlockType.TABLE_FOOTNOTE
    )
    if captions:
        if not any(_is_continuation_caption(b) for b in captions):
            return False
        if footnotes > 1:
            return False
    elif footnotes > 0:
        return False
    x0a, _, x1a, _ = cur_block["bbox"]
    x0b, _, x1b, _ = prev_block["bbox"]
    wa, wb = x1a - x0a, x1b - x0b
    if wa > 0 and wb > 0 and abs(wa - wb) / min(wa, wb) >= 0.1:
        return False
    return True


def _structure_matches(prev_rows, prev_metrics, prev_total,
                       cur_rows, cur_metrics, cur_total) -> tuple[bool, int]:
    """-> (mergeable, header_rows_to_skip)."""
    headers = detect_header_rows(prev_rows, prev_metrics, cur_rows, cur_metrics)
    headers = expand_header_by_rowspan(cur_rows, headers)
    if prev_total == cur_total:
        return True, headers
    # boundary rows: previous last data row vs continuation first data row
    if not prev_metrics or headers >= len(cur_metrics):
        return False, headers
    last = None
    for m, row in zip(reversed(prev_metrics), reversed(prev_rows)):
        if row:
            last = m
            break
    first = cur_metrics[headers]
    if last is None:
        return False, headers
    if last[0] == first[0] or last[1] == first[1]:
        return True, headers
    return False, headers


def _merge_html(top: str, cur_rows: list[list[_Cell]], skip: int) -> str:
    body = "".join(
        "<tr>" + "".join(c.html for c in row) + "</tr>"
        for row in cur_rows[skip:]
    )
    if not body:
        return top
    m = re.search(r"</tbody>", top, re.I) or re.search(r"</table>", top, re.I)
    if not m:
        return top + body
    return top[: m.start()] + body + top[m.start() :]


def cross_page_table_merge(page_info_list: list[dict]) -> None:
    import os

    enable = os.environ.get(
        "RAPIDDOC_TABLE_MERGE_ENABLE",
        os.environ.get("MINERU_TABLE_MERGE_ENABLE", "true"),
    )
    if enable.lower() in ("false", "0", "no"):
        return
    # walk back-to-front so chains of continuations collapse into page 1
    # (reference: merge_table iterates page_idx descending)
    for page_idx in range(len(page_info_list) - 1, 0, -1):
        next_page = page_info_list[page_idx]
        prev_page = page_info_list[page_idx - 1]
        next_blocks = next_page.get("para_blocks") or next_page.get(
            "preproc_blocks"
        ) or []
        prev_blocks = prev_page.get("para_blocks") or prev_page.get(
            "preproc_blocks"
        ) or []
        if not (next_blocks and next_blocks[0]["type"] == BlockType.TABLE):
            continue
        if not (prev_blocks and prev_blocks[-1]["type"] == BlockType.TABLE):
            continue
        first, last = next_blocks[0], prev_blocks[-1]
        if not _can_merge(last, first):
            continue
        html_top, html_bot = _table_html(last), _table_html(first)
        if not html_top or not html_bot:
            continue
        prev_rows = parse_rows(html_top)
        cur_rows = parse_rows(html_bot)
        if not prev_rows or not cur_rows:
            continue
        prev_metrics, prev_total = scan_rows(prev_rows)
        cur_metrics, cur_total = scan_rows(cur_rows)
        ok, headers = _structure_matches(
            prev_rows, prev_metrics, prev_total,
            cur_rows, cur_metrics, cur_total,
        )
        if not ok:
            continue
        _set_table_html(last, _merge_html(html_top, cur_rows, headers))
        # footnotes travel to the merged table as cross-page blocks
        carried = [
            dict(b, **{SplitFlag.CROSS_PAGE: True})
            for b in first.get("blocks", [])
            if b["type"] == BlockType.TABLE_FOOTNOTE
        ]
        if carried:
            last["blocks"] = [
                b
                for b in last.get("blocks", [])
                if b["type"] != BlockType.TABLE_FOOTNOTE
            ] + carried
        first[SplitFlag.LINES_DELETED] = True
        for sub in first.get("blocks", []):
            sub["lines"] = []
            sub[SplitFlag.LINES_DELETED] = True
        for key in ("para_blocks", "preproc_blocks"):
            if key in next_page and first in next_page[key]:
                next_page[key] = [b for b in next_page[key] if b is not first]
