"""Cross-page table merging.

Behavioral counterpart of the reference
(reference: rapid_doc/backend/utils/utils.py:14 cross_page_table_merge +
utils/table_merge.py): a table at the bottom of page N whose structure
continues at the top of page N+1 (same column signature, continuation has
no caption) is merged into one HTML table.
"""
from __future__ import annotations

import re

from ..types import BlockType, ContentType, SplitFlag

_TR_RE = re.compile(r"<tr[^>]*>.*?</tr>", re.S | re.I)
_CELL_RE = re.compile(r"<t[dh][^>]*>", re.I)


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


def _has_caption(block: dict) -> bool:
    return any(
        sub["type"] == BlockType.TABLE_CAPTION and sub.get("lines")
        for sub in block.get("blocks", [])
    )


def _column_signature(html: str) -> tuple[int, ...] | None:
    """Cell count per row for the first few rows."""
    rows = _TR_RE.findall(html)
    if not rows:
        return None
    return tuple(len(_CELL_RE.findall(r)) for r in rows[:3])


def _merge_html(top: str, bottom: str) -> str:
    """Append bottom's rows into top's table element."""
    bottom_rows = _TR_RE.findall(bottom)
    if not bottom_rows:
        return top
    m = re.search(r"</table>", top, re.I)
    if not m:
        return top + "".join(bottom_rows)
    return top[: m.start()] + "".join(bottom_rows) + top[m.start() :]


def cross_page_table_merge(page_info_list: list[dict]) -> None:
    for prev_page, next_page in zip(page_info_list, page_info_list[1:]):
        prev_blocks = prev_page.get("para_blocks") or prev_page.get("preproc_blocks") or []
        next_blocks = next_page.get("para_blocks") or next_page.get("preproc_blocks") or []
        prev_tables = [b for b in prev_blocks if b["type"] == BlockType.TABLE]
        next_tables = [b for b in next_blocks if b["type"] == BlockType.TABLE]
        if not prev_tables or not next_tables:
            continue
        last, first = prev_tables[-1], next_tables[0]
        # only merge when the continuation table leads its page and has no
        # caption of its own
        if next_blocks and next_blocks[0] is not first:
            continue
        if _has_caption(first):
            continue
        html_top, html_bot = _table_html(last), _table_html(first)
        if not html_top or not html_bot:
            continue
        sig_top = _column_signature(html_top)
        sig_bot = _column_signature(html_bot)
        if not sig_top or not sig_bot:
            continue
        if max(sig_top) != max(sig_bot):
            continue
        _set_table_html(last, _merge_html(html_top, html_bot))
        first[SplitFlag.LINES_DELETED] = True
        for key in ("para_blocks", "preproc_blocks"):
            if key in next_page and first in next_page[key]:
                next_page[key] = [b for b in next_page[key] if b is not first]
