"""Standalone per-model CLIs (reference: each vendored stack's main())."""
import json

import numpy as np
import pytest
from PIL import Image


def test_ocr_cli_smoke(tmp_path, capsys, monkeypatch):
    monkeypatch.delenv("RAPIDDOC_DISABLE_OCR", raising=False)
    from rapiddoc_tpu.models.cli import main
    from rapiddoc_tpu.models.registry import DEMO_ASSETS_DIR

    if not (DEMO_ASSETS_DIR / "ocr_det_demo.npz").is_file():
        pytest.skip("demo OCR checkpoints unavailable")
    from rapiddoc_tpu.train.synth import render_page
    import random

    img, *_ = render_page(random.Random(5), 320)
    p = tmp_path / "page.png"
    Image.fromarray(img).save(p)
    out_file = tmp_path / "out.json"
    main("ocr", [str(p), "--config", '{"Det.limit_side_len": 320}',
                 "-o", str(out_file)])
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["file"] == str(p)
    assert isinstance(rec["result"], list) and rec["result"]
    first = rec["result"][0]
    assert {"box", "text", "score"} <= set(first)
    # -o mirrors stdout
    assert json.loads(out_file.read_text())["file"] == str(p)


def test_layout_cli_json_clean(tmp_path, capsys, monkeypatch):
    """Layout CLI emits plain-float polys (no stringified numpy)."""
    from rapiddoc_tpu.models.cli import main
    from rapiddoc_tpu.models.registry import DEMO_ASSETS_DIR

    if not (DEMO_ASSETS_DIR / "layout_demo.npz").is_file():
        pytest.skip("demo layout checkpoint unavailable")
    monkeypatch.setenv("RAPIDDOC_DEMO_LAYOUT", "1")
    monkeypatch.delenv("RAPIDDOC_DISABLE_LAYOUT", raising=False)
    arr = np.full((320, 320, 3), 255, np.uint8)
    arr[40:80, 40:280] = 0
    p = tmp_path / "page.png"
    Image.fromarray(arr).save(p)
    main("layout", [str(p)])
    rec = json.loads(capsys.readouterr().out.strip())
    for det in rec["result"]:
        assert all(isinstance(v, float) for v in det["poly"])
