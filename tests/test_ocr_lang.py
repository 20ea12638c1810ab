"""Per-language OCR end-to-end (VERDICT r4 next #9): a non-Latin demo
rec checkpoint loads through the registry's per-lang path
(models/registry.py ocr_rec_<lang> loading; reference ships per-lang
rapidocr rec models + dicts) and recognizes Cyrillic pages."""
import os
import random
from pathlib import Path

import numpy as np
import pytest

ASSETS = Path(__file__).resolve().parents[1] / "rapiddoc_tpu" / "assets"

needs_ru = pytest.mark.skipif(
    not (ASSETS / "ocr_rec_ru_demo.npz").is_file()
    or not (ASSETS / "ocr_rec_ru_dict.txt").is_file()
    or not (ASSETS / "ocr_det_demo.npz").is_file(),
    reason="Cyrillic demo rec checkpoint unavailable",
)


def _edit_distance(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_lang_charsets_registered():
    from rapiddoc_tpu.train.synth import CYRILLIC_CHARSET, LANG_CHARSETS

    assert LANG_CHARSETS["ru"] is CYRILLIC_CHARSET
    assert "я" in CYRILLIC_CHARSET and "Ё" in CYRILLIC_CHARSET
    dict_file = ASSETS / "ocr_rec_ru_dict.txt"
    if dict_file.is_file():
        lines = [
            ln for ln in dict_file.read_text(encoding="utf-8").splitlines()
            if ln
        ]
        assert lines == [c for c in CYRILLIC_CHARSET if c.strip()] or (
            len(lines) == len(CYRILLIC_CHARSET)
        )


@needs_ru
def test_cyrillic_rec_loads_through_registry():
    if os.environ.get("RAPIDDOC_DISABLE_OCR"):
        del os.environ["RAPIDDOC_DISABLE_OCR"]
    from rapiddoc_tpu.models.registry import build_ocr_system

    ts = build_ocr_system(lang="ru")
    joined = "".join(ts.recognizer.decoder.chars)
    assert "я" in joined, "per-lang charset not loaded"


@needs_ru
def test_cyrillic_page_cer():
    """det -> crop -> rec over a rendered Cyrillic page: CER gate on the
    per-lang demo checkpoint (mirrors test_ocr_quality's en gate)."""
    if os.environ.get("RAPIDDOC_DISABLE_OCR"):
        del os.environ["RAPIDDOC_DISABLE_OCR"]
    from PIL import Image

    from rapiddoc_tpu.models.registry import build_ocr_system
    from rapiddoc_tpu.train.synth import random_text_lang, render_line

    ts = build_ocr_system(lang="ru")
    rng = random.Random(77)
    # compose a simple page of isolated Cyrillic lines at known positions
    page = np.full((640, 480, 3), 255, np.uint8)
    gts: list[str] = []
    y = 30
    while y < 560:
        text = random_text_lang(rng, "ru", max_words=3)[:24].strip()
        if not text:
            continue
        line = render_line(text, rng, height=32)
        h, w = line.shape[:2]
        w = min(w, 440)
        page[y : y + h, 20 : 20 + w] = line[:, :w]
        gts.append(text)
        y += h + 26

    results = ts([page])[0]
    assert len(results) >= 0.7 * len(gts), (len(results), len(gts))
    total_ed = 0
    total_len = 0
    matched = 0
    for res in results:
        got = res["text"].replace(" ", "")
        best = None
        best_ed = 10**9
        for gt in gts:
            ed = _edit_distance(got, gt.replace(" ", ""))
            if ed < best_ed:
                best_ed, best = ed, gt
        if best is not None:
            matched += 1
            total_ed += best_ed
            total_len += len(best.replace(" ", ""))
    assert matched
    cer = total_ed / max(total_len, 1)
    assert cer < 0.25, f"Cyrillic CER {cer:.3f}"
