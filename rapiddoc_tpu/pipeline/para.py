"""Paragraph splitting/merging across pages and list detection.

Behavioral counterpart of the reference para_split
(reference: rapid_doc/backend/pipeline/para_split.py — ListLineTag line
tagging, cross-page paragraph continuation via SplitFlag.CROSS_PAGE).
"""
from __future__ import annotations

import re

from ..types import BlockType, SplitFlag

LIST_START_RE = re.compile(
    r"^\s*(?:[-•▪◦●○·*]|\(?\d{1,3}[.)]|\(?[a-zA-Z][.)]|\[\d{1,3}\]|"
    r"[ivxlcIVXLC]{1,6}[.)]|第[一二三四五六七八九十百]+[章节条款]|[一二三四五六七八九十]+[、.])"
)
SENTENCE_END = tuple(".!?。！？:：;；")
HYPHEN_END_RE = re.compile(r"[A-Za-z]-\s*$")


class ListLineTag:
    IS_LIST_START_LINE = "is_list_start_line"
    IS_LIST_END_LINE = "is_list_end_line"


def _line_text(line: dict) -> str:
    return "".join(s.get("content", "") or "" for s in line.get("spans", []))


def _block_text(block: dict) -> str:
    return "\n".join(_line_text(ln) for ln in block.get("lines", []))


def _detect_list_block(block: dict) -> None:
    """Tag list-start lines; retype TEXT blocks that look like lists."""
    lines = block.get("lines", [])
    if len(lines) < 2:
        return
    starts = 0
    for line in lines:
        if LIST_START_RE.match(_line_text(line)):
            starts += 1
            line[ListLineTag.IS_LIST_START_LINE] = True
    if starts >= 2 and starts >= len(lines) * 0.4:
        if block["type"] == BlockType.TEXT:
            block["type"] = BlockType.LIST


def _is_index_block(block: dict) -> bool:
    """TOC-like: many lines ending in page numbers / dot leaders."""
    lines = block.get("lines", [])
    if len(lines) < 3:
        return False
    hits = sum(
        1
        for ln in lines
        if re.search(r"(\.{3,}|…{2,})\s*\d+\s*$", _line_text(ln))
        or re.search(r"\s\d{1,4}\s*$", _line_text(ln))
    )
    return hits >= len(lines) * 0.8


def _para_continues(prev_block: dict, next_block: dict) -> bool:
    """Whether next_block continues the paragraph ending prev_block."""
    prev_text = _block_text(prev_block).rstrip()
    next_text = _block_text(next_block).lstrip()
    if not prev_text or not next_text:
        return False
    if prev_text.endswith(SENTENCE_END):
        return False
    if LIST_START_RE.match(next_text):
        return False
    first = next_text[0]
    if first.isupper() and not HYPHEN_END_RE.search(prev_text):
        # next starts a new sentence with a capital; only merge when the
        # previous clearly dangles (comma or open word)
        if not prev_text.endswith((",", "，", "-", "、")):
            return False
    return True


def para_split(page_info_list: list[dict]) -> None:
    """Populate para_blocks on each page, merging cross-page paragraphs."""
    # per-page: list/index detection on text blocks
    for page_info in page_info_list:
        for block in page_info.get("preproc_blocks", []):
            if block["type"] == BlockType.TEXT:
                _detect_list_block(block)
                if block["type"] == BlockType.TEXT and _is_index_block(block):
                    block["type"] = BlockType.INDEX

    # cross-page paragraph merge: last text block of page N + first text
    # block of page N+1
    for prev_page, next_page in zip(page_info_list, page_info_list[1:]):
        prev_blocks = prev_page.get("preproc_blocks", [])
        next_blocks = next_page.get("preproc_blocks", [])
        prev_text_blocks = [b for b in prev_blocks if b["type"] == BlockType.TEXT]
        next_text_blocks = [b for b in next_blocks if b["type"] == BlockType.TEXT]
        if not prev_text_blocks or not next_text_blocks:
            continue
        last, first = prev_text_blocks[-1], next_text_blocks[0]
        if last is not prev_blocks[-1] or first is not next_blocks[0]:
            # only merge when they are truly the page-edge blocks
            non_discardable_prev = [
                b for b in prev_blocks if b["type"] != BlockType.INTERLINE_EQUATION
            ]
            if not non_discardable_prev or last is not non_discardable_prev[-1]:
                continue
        if _para_continues(last, first):
            for line in first.get("lines", []):
                line[SplitFlag.CROSS_PAGE] = True
            last.setdefault("lines", []).extend(first.get("lines", []))
            first["lines"] = []
            first[SplitFlag.LINES_DELETED] = True

    for page_info in page_info_list:
        page_info["para_blocks"] = [
            b
            for b in page_info.get("preproc_blocks", [])
            if not b.get(SplitFlag.LINES_DELETED)
        ]
