"""End-to-end pipeline over the demo-trained model stack.

Feeds a synthetic labeled page (train/synth_layout) through the full
RapidDoc image path with the demo layout model enabled and asserts the
device-model-driven structure survives to markdown/middle_json — the
layout-driven analogue of the OCR-mode fixture gate. Slow + skipped
until the demo layout checkpoint is trained.
"""
from __future__ import annotations

import io
import os
import random

import numpy as np
import pytest

from rapiddoc_tpu.models.registry import DEMO_ASSETS_DIR

slow = pytest.mark.skipif(
    not os.environ.get("RAPIDDOC_RUN_SLOW"),
    reason="slow demo-pipeline e2e (RAPIDDOC_RUN_SLOW=1)",
)


@slow
def test_layout_driven_page_to_markdown(tmp_path, monkeypatch):
    if not (DEMO_ASSETS_DIR / "layout_demo.npz").is_file():
        pytest.skip("layout_demo not trained yet")
    monkeypatch.setenv("RAPIDDOC_DEMO_LAYOUT", "1")
    # conftest disables the heavyweight stacks by default; this test is
    # exactly about the layout-model-driven path
    monkeypatch.delenv("RAPIDDOC_DISABLE_LAYOUT", raising=False)

    from PIL import Image

    from rapiddoc_tpu.api import RapidDoc
    from rapiddoc_tpu.train.synth_layout import LABEL, render_layout_page

    rng = random.Random(31337)
    # find a held-out page that contains a table and a title block
    for _ in range(20):
        img, gt = render_layout_page(rng, 640)
        cats = {cid for cid, *_ in gt}
        if LABEL["table"] in cats and (
            LABEL["doc_title"] in cats or LABEL["paragraph_title"] in cats
        ):
            break
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")

    doc = RapidDoc()
    out = doc(buf.getvalue(), parse_method="ocr")
    if isinstance(out, list):
        out = out[0]

    assert out.markdown.strip(), "markdown must not be empty"
    pages = out.middle_json["pdf_info"]
    blocks = [
        b
        for page in pages
        for b in (page.get("para_blocks") or page.get("preproc_blocks") or [])
    ]
    types = {b.get("type") for b in blocks}
    # the layout model must have driven real region structure: at least
    # a table or title block materialized (not just plain text lines)
    assert types & {"table", "title", "image"}, types
    # layout stage must have run on the device path
    report = out.stage_report or {}
    assert any("layout" in k for k in report), report
