"""Language detection & file-type sniffing.

Role parity with the reference (reference:
rapid_doc/model/fast_langdetect/infer.py fasttext lid.176 and
rapid_doc/utils/guess_suffix_or_lang.py + the vendored Magika DL
sniffer). This environment has neither fasttext nor onnx, so language
detection is Unicode-script-based (reliable for the doc-parsing decision:
which OCR dictionary family applies) and file sniffing is magic-byte based.
"""
from __future__ import annotations

import re
from collections import Counter

_SCRIPT_RANGES = [
    ("ch", 0x4E00, 0x9FFF), ("ch", 0x3400, 0x4DBF),
    ("japan", 0x3040, 0x30FF),
    ("korean", 0xAC00, 0xD7AF), ("korean", 0x1100, 0x11FF),
    ("arabic", 0x0600, 0x06FF), ("arabic", 0x0750, 0x077F),
    ("cyrillic", 0x0400, 0x04FF),
    ("devanagari", 0x0900, 0x097F),
    ("ta", 0x0B80, 0x0BFF),
    ("te", 0x0C00, 0x0C7F),
    ("ka", 0x0C80, 0x0CFF),
    ("th", 0x0E00, 0x0E7F),
    ("el", 0x0370, 0x03FF),
    ("latin", 0x0041, 0x024F),
]


# Latin-script language discrimination (role of fasttext lid.176 for the
# languages the script ranges cannot separate): tiny stopword profiles +
# characteristic diacritics. Stopword lists are the highest-frequency
# function words per language — a dozen each is enough to separate
# running text reliably.
_LATIN_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with",
           "was", "are", "this"},
    "fr": {"le", "la", "les", "des", "du", "et", "est", "une", "dans",
           "pour", "que", "qui", "sur", "pas"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "für", "auf", "den", "von", "zu"},
    "es": {"el", "los", "las", "y", "que", "en", "es", "una", "por",
           "con", "para", "se", "del", "lo"},
    "it": {"il", "di", "che", "per", "con", "una", "del", "non", "sono",
           "della", "gli", "nel"},
    "pt": {"o", "os", "as", "que", "em", "uma", "para", "com", "não",
           "dos", "do", "da", "como"},
    "nl": {"de", "het", "een", "en", "van", "is", "niet", "met", "op",
           "voor", "dat", "zijn"},
}
_LATIN_DIACRITICS = {
    "fr": "éèêëàâîïôûùç«»",
    "de": "äöüßÄÖÜ",
    "es": "ñáíóúü¿¡",
    "it": "àèéìòù",
    "pt": "ãõçáâêôí",
}
_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")


def _detect_latin_lang(text: str) -> str:
    # trained n-gram model first (fasttext lid.176 role, utils/langid.py);
    # the stopword/diacritic heuristic stays as the low-confidence tiebreak
    from .langid import classify

    lang, margin = classify(text, "latin")
    # margin is per-gram: ~0.02+ already separates well on a sentence of
    # running text; below that (or on very short text) fall back to the
    # stopword/diacritic heuristic. Languages the heuristic has no
    # stopword/diacritic profile for (the long tail beyond the 7 major
    # ones) trust the classifier at a lower bar — the fallback could
    # only ever misroute them to a major language.
    if len(text.strip()) >= 40 and (
        margin >= 0.015
        or (margin >= 0.008 and lang not in _LATIN_STOPWORDS)
    ):
        return lang
    words = [w.lower() for w in _WORD_RE.findall(text[:4000])]
    if not words:
        return "en"
    scores: Counter[str] = Counter()
    for w in words:
        for stop_lang, stops in _LATIN_STOPWORDS.items():
            if w in stops:
                scores[stop_lang] += 1
    for ch in text[:4000]:
        for dia_lang, marks in _LATIN_DIACRITICS.items():
            if ch in marks:
                scores[dia_lang] += 2
    if not scores:
        # same trust bar as above: the classifier is only believed on
        # text long enough to carry n-gram signal
        if margin >= 0.02 and len(text.strip()) >= 40:
            return lang
        return "en"
    heur, n = scores.most_common(1)[0]
    # demand a real signal before leaving the default dictionary family
    if heur != "en" and n < max(3, len(words) // 50):
        return "en"
    return heur


def detect_lang(text: str, default: str = "ch") -> str:
    """Dominant script of the text -> OCR language family id."""
    if not text:
        return default
    counts: Counter[str] = Counter()
    for ch in text[:4000]:
        o = ord(ch)
        if o < 0x41:
            continue
        for lang, lo, hi in _SCRIPT_RANGES:
            if lo <= o <= hi:
                counts[lang] += 1
                break
    if not counts:
        return default
    lang, n = counts.most_common(1)[0]
    # CJK docs with latin sprinkles stay CJK; latin needs a clear majority
    if lang == "latin" and counts.get("ch", 0) + counts.get("japan", 0) > n * 0.15:
        return "ch"
    if lang == "latin":
        return _detect_latin_lang(text)
    if lang == "japan" and counts.get("ch", 0) > n * 3:
        return "ch"
    if lang == "cyrillic":
        # refine within the script family (ru/uk/bg/... share the range
        # and per-lang rec checkpoints exist per ISO code)
        from .langid import classify

        sub, margin = classify(text, "cyrillic")
        return sub if margin >= 0.01 and len(text.strip()) >= 40 else "ru"
    # arabic/devanagari stay FAMILY names: the OCR rec model families
    # are script-level there (reference rapidocr lang keys "arabic" etc.
    # cover ar/fa/ur with one dictionary); use classify_language() for
    # the fine-grained ISO code
    return lang


def classify_language(text: str) -> str:
    """Fine-grained ISO language code (fasttext lid.176 role): resolves
    within-script languages the OCR-routing detect_lang leaves at the
    family level (arabic -> ar/fa/ur, devanagari -> hi/mr/ne)."""
    fam = detect_lang(text)
    if fam in ("arabic", "devanagari"):
        from .langid import classify

        sub, margin = classify(text, fam)
        if margin >= 0.01 and len(text.strip()) >= 40:
            return sub
        return {"arabic": "ar", "devanagari": "hi"}[fam]
    return fam


def guess_language_by_text(text: str) -> str:
    return detect_lang(text)


_MAGIC = [
    (b"%PDF-", "pdf"),
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "webp"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"\xd0\xcf\x11\xe0", "doc"),  # legacy OLE container (doc/ppt/xls)
]


def guess_suffix_by_bytes(data: bytes) -> str | None:
    """Sniff a file's type from content (Magika-role replacement)."""
    if not data:
        return None
    for magic, suffix in _MAGIC:
        if data[: len(magic)] == magic:
            return suffix
    if data[:4] == b"PK\x03\x04":
        # zip entry names are stored uncompressed, but the OOXML marker
        # dirs aren't guaranteed inside the first bytes — read the real
        # name list when possible
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(data)) as z:
                names = z.namelist()
            if any(n.startswith("word/") for n in names):
                return "docx"
            if any(n.startswith("ppt/") for n in names):
                return "pptx"
            if any(n.startswith("xl/") for n in names):
                return "xlsx"
        except zipfile.BadZipFile:
            pass
        head = data[:8192]
        for marker, suffix in (
            (b"word/", "docx"), (b"ppt/", "pptx"), (b"xl/", "xlsx")
        ):
            if marker in head:
                return suffix
        return "zip"
    # texty content?
    sample = data[:2048]
    try:
        sample.decode("utf-8")
        return "txt"
    except UnicodeDecodeError:
        return None


_CODE_HINTS = {
    "python": re.compile(r"^\s*(def |import |from \w+ import|class \w+[(:])", re.M),
    "c": re.compile(r"#include\s*<|int\s+main\s*\("),
    "javascript": re.compile(r"\b(function|const|let)\b.*[={]|=>"),
    "java": re.compile(r"\bpublic\s+(class|static)\b"),
    "html": re.compile(r"<(!DOCTYPE|html|div|span|body)\b", re.I),
    "json": re.compile(r"^\s*[\[{]"),
}


def guess_code_lang(text: str) -> str | None:
    for lang, pattern in _CODE_HINTS.items():
        if pattern.search(text[:4000]):
            return lang
    return None
