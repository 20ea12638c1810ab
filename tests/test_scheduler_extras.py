"""Scheduler extras: orientation coord restore, seal unwrap geometry."""
import numpy as np


def test_rotate_dets_back_identity_cycle():
    from rapiddoc_tpu.pipeline.scheduler import _quad_poly, _rotate_dets_back

    w, h = 200, 100  # original page
    # a box in original coords
    orig = [20.0, 30.0, 80.0, 60.0]
    for angle in (90, 180, 270):
        # forward-rotate the box like np.rot90(img, angle//90) does
        x0, y0, x1, y1 = orig
        if angle == 90:  # np.rot90 CCW once: (x,y)->(y, w-1-x); dims swap
            pts = [(y, w - 1 - x) for x, y in ((x0, y0), (x1, y1))]
            rot_w, rot_h = h, w
        elif angle == 180:
            pts = [(w - 1 - x, h - 1 - y) for x, y in ((x0, y0), (x1, y1))]
            rot_w, rot_h = w, h
        else:  # 270
            pts = [(h - 1 - y, x) for x, y in ((x0, y0), (x1, y1))]
            rot_w, rot_h = h, w
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        det = {"poly": _quad_poly(min(xs), min(ys), max(xs), max(ys))}
        _rotate_dets_back([det], angle, rot_w, rot_h)
        back = [det["poly"][0], det["poly"][1], det["poly"][4], det["poly"][5]]
        np.testing.assert_allclose(back, orig, atol=1.5, err_msg=f"angle {angle}")


def test_circle_detection_and_unwrap():
    import cv2

    from rapiddoc_tpu.models.ocr.seal import detect_circle, unwrap_circular_text

    img = np.full((200, 200, 3), 255, np.uint8)
    cv2.circle(img, (100, 100), 80, (180, 30, 30), 4)
    circle = detect_circle(img)
    assert circle is not None
    cx, cy, r = circle
    assert abs(cx - 100) < 12 and abs(cy - 100) < 12 and abs(r - 80) < 15
    strip = unwrap_circular_text(img, cx, cy, r)
    assert strip.shape[1] > strip.shape[0]  # a wide strip


def test_checkbox_dets_in_scheduler():
    import cv2
    import numpy as np

    from rapiddoc_tpu.pipeline.scheduler import DocumentAnalyzer
    from rapiddoc_tpu.types import CategoryId

    img = np.full((200, 300, 3), 255, np.uint8)
    cv2.rectangle(img, (50, 50), (80, 80), (0, 0, 0), 2)       # empty box
    cv2.rectangle(img, (120, 50), (150, 80), (0, 0, 0), 2)     # checked box
    cv2.line(img, (124, 54), (146, 76), (0, 0, 0), 3)
    cv2.line(img, (146, 54), (124, 76), (0, 0, 0), 3)
    an = DocumentAnalyzer(checkbox_enable=True)
    infos = an.analyze_pages([img], ["txt"], [None])
    cb = [d for d in infos[0]["layout_dets"]
          if d["category_id"] == CategoryId.CheckBox]
    assert len(cb) >= 2
    glyphs = {d["checkbox"] for d in cb}
    assert "☑" in glyphs and "☐" in glyphs


def test_formula_number_tag_merge():
    from rapiddoc_tpu.pipeline.middle import _merge_formula_numbers
    from rapiddoc_tpu.types import BlockType, ContentType

    eq_span = {"type": ContentType.INTERLINE_EQUATION, "content": "E=mc^2"}
    pages = [{
        "preproc_blocks": [
            {"type": BlockType.INTERLINE_EQUATION,
             "lines": [{"spans": [eq_span]}], "bbox": [0, 0, 100, 20]},
            {"type": BlockType.FORMULA_NUMBER,
             "lines": [{"spans": [{"type": ContentType.TEXT,
                                   "content": "(1)"}]}],
             "bbox": [110, 0, 130, 20]},
            {"type": BlockType.FORMULA_NUMBER,
             "lines": [{"spans": [{"type": ContentType.TEXT,
                                   "content": "orphan-5"}]}],
             "bbox": [110, 50, 170, 70]},
        ]
    }]
    _merge_formula_numbers(pages)
    blocks = pages[0]["preproc_blocks"]
    assert eq_span["content"] == "E=mc^2\\tag{1}"
    # merged number block removed; orphan demoted to text
    assert [b["type"] for b in blocks] == [
        BlockType.INTERLINE_EQUATION, BlockType.TEXT,
    ]


def test_ocr_masks_formula_regions():
    import numpy as np

    from rapiddoc_tpu.pipeline.scheduler import DocumentAnalyzer
    from rapiddoc_tpu.types import CategoryId

    captured = {}

    class SpyDet:
        def __call__(self, images):
            captured["images"] = images
            from rapiddoc_tpu.models.ocr.engine import DetResult
            return [DetResult(np.zeros((0, 4, 2)), np.zeros(0))
                    for _ in images]

    class SpyOcr:
        detector = SpyDet()
        recognizer = staticmethod(lambda crops, **kw: [])
        drop_score = 0.5

    img = np.zeros((100, 100, 3), np.uint8)
    an = DocumentAnalyzer(ocr_system=SpyOcr())
    infos = [{"layout_dets": [{
        "category_id": CategoryId.InterlineEquation_YOLO,
        "poly": [10, 10, 50, 10, 50, 30, 10, 30], "score": 1.0,
    }]}]
    an._run_page_ocr([0], [img], infos)
    masked = captured["images"][0]
    assert masked[20, 30, 0] == 255  # formula region painted white
    assert masked[60, 60, 0] == 0    # rest untouched
    assert img[20, 30, 0] == 0       # original page not mutated


def test_window_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from rapiddoc_tpu.utils.checkpoint import WindowCheckpoint, checkpoint_key

    key = checkpoint_key(b"pdfbytes", "txt", 200, 64)
    ck = WindowCheckpoint(tmp_path, key)
    infos = [{"layout_dets": [{
        "category_id": 1, "poly": np.array([0.0, 1, 2, 3, 4, 5, 6, 7]),
        "score": np.float32(0.9),
    }]}]
    assert ck.load(0) is None
    ck.save(0, infos)
    loaded = ck.load(0)
    assert loaded[0]["layout_dets"][0]["poly"] == [0, 1, 2, 3, 4, 5, 6, 7]
    assert abs(loaded[0]["layout_dets"][0]["score"] - 0.9) < 1e-6
    # different options -> different key
    assert checkpoint_key(b"pdfbytes", "ocr", 200, 64) != key


def test_parse_resumes_from_checkpoint(tmp_path):
    from PIL import Image, ImageDraw

    from rapiddoc_tpu import RapidDoc, pdfio

    img = Image.new("RGB", (300, 200), "white")
    ImageDraw.Draw(img).text((40, 90), "checkpoint page", fill="black")
    pdf = pdfio.images_to_pdf([img])
    eng = RapidDoc(formula_enable=False, table_enable=False,
                   parse_method="txt", checkpoint_dir=tmp_path)
    out1 = eng(pdf)
    files = list(tmp_path.rglob("win_*.json"))
    assert files, "checkpoint written"
    out2 = eng(pdf)  # second run loads the window from disk
    assert out2.markdown == out1.markdown


def test_orientation_gate(monkeypatch):
    from rapiddoc_tpu.models import registry

    monkeypatch.setenv("USE_DOC_ORIENTATION_CLASSIFY", "true")
    an = registry.build_analyzer(formula_enable=False, table_enable=False)
    assert an.orientation_model is not None
    monkeypatch.delenv("USE_DOC_ORIENTATION_CLASSIFY")
    an2 = registry.build_analyzer(formula_enable=False, table_enable=False)
    assert an2.orientation_model is None


def test_missed_text_recovery():
    import numpy as np

    from rapiddoc_tpu.models.ocr.engine import DetResult, RecResult
    from rapiddoc_tpu.pipeline.scheduler import DocumentAnalyzer
    from rapiddoc_tpu.types import CategoryId

    class StubLayout:
        def batch_predict(self, images):
            return [[{"category_id": CategoryId.Text,
                      "poly": [10, 10, 200, 10, 200, 60, 10, 60],
                      "score": 0.9}] for _ in images]

    class StubOcr:
        drop_score = 0.5

        class detector:  # finds nothing on the page
            def __call__(self, images):
                return [DetResult(np.zeros((0, 4, 2)), np.zeros(0))
                        for _ in images]
        detector = detector()

        @staticmethod
        def recognizer(crops, **kw):
            return [RecResult("recovered", 0.95) for _ in crops]

    an = DocumentAnalyzer(layout_model=StubLayout(), ocr_system=StubOcr())
    img = np.full((100, 300, 3), 255, np.uint8)
    infos = an.analyze_pages([img], ["ocr"], [None])
    recovered = [d for d in infos[0]["layout_dets"]
                 if d["category_id"] == CategoryId.OcrText]
    assert recovered and recovered[0]["text"] == "recovered"


def test_page_decoration_detection():
    from rapiddoc_tpu.pipeline.scheduler import (
        _looks_like_page_decoration,
        decoration_texts,
    )

    def blk(y0, y1, text):
        return {"bbox": [100, y0, 500, y1], "lines": [{"text": text}]}

    # page number at the bottom edge
    assert _looks_like_page_decoration(blk(950, 960, "3"), 1000, set())
    assert _looks_like_page_decoration(blk(950, 960, "第 3 页 / 共 9 页"),
                                       1000, set())
    # body text near the bottom is kept
    assert not _looks_like_page_decoration(
        blk(950, 960, "conclusion paragraph text"), 1000, set())
    # repeating running header across pages
    tds = [
        {"height": 1000, "blocks": [blk(20, 40, f"ACME Quarterly {i}"),
                                    blk(400, 420, "body")]}
        for i in range(4)
    ]
    rep = decoration_texts(tds)
    assert "ACME Quarterly #" in rep
    assert _looks_like_page_decoration(blk(20, 40, "ACME Quarterly 2"),
                                       1000, rep)
    # one-off top block is not a decoration
    assert not _looks_like_page_decoration(blk(20, 40, "Document Title"),
                                           1000, rep)


def test_seal_batch_ocr():
    import cv2

    from rapiddoc_tpu.models.ocr.seal import SealOCR

    calls = []

    class FakeTextSystem:
        def __call__(self, regions):
            calls.append(len(regions))
            return [[{"text": f"r{i}"}] for i in range(len(regions))]

    circle = np.full((200, 200, 3), 255, np.uint8)
    cv2.circle(circle, (100, 100), 80, (180, 30, 30), 4)
    flat = np.full((100, 200, 3), 255, np.uint8)
    texts = SealOCR(FakeTextSystem()).batch([circle, flat])
    assert len(texts) == 2 and all(t for t in texts)
    # one batched text-system call for all regions of all seals
    assert len(calls) == 1 and calls[0] >= 3


def test_merge_touching_boxes_scan_strips():
    """Tiled scan strips collapse to one box; separated figures stay."""
    from rapiddoc_tpu.pipeline.scheduler import _merge_touching_boxes

    strips = [[0.0, float(i * 50), 800.0, float(i * 50 + 50)] for i in range(8)]
    merged = _merge_touching_boxes(strips, tol=3.0)
    assert merged == [[0.0, 0.0, 800.0, 400.0]]

    apart = [[0, 0, 100, 100], [300, 300, 400, 400]]
    assert len(_merge_touching_boxes(apart, tol=3.0)) == 2

    # transitive chains merge through intermediates
    chain = [[0, 0, 10, 10], [9, 0, 20, 10], [19, 0, 30, 10]]
    assert _merge_touching_boxes(chain, tol=1.0) == [[0, 0, 30, 10]]


def test_fallback_layout_merges_strips_and_drops_scan_substrate():
    """OCR-mode pages made of image tiles collapse to one ImageBody,
    which is dropped once OCR finds text inside it; a picture-only page
    (no text) keeps its image."""
    from rapiddoc_tpu.pipeline.scheduler import (
        DocumentAnalyzer,
        _drop_scan_substrate_images,
    )
    from rapiddoc_tpu.types import CategoryId

    sched = DocumentAnalyzer.__new__(DocumentAnalyzer)  # no models needed
    sched.formula_enable = False
    sched.formula_model = None

    def bodies(info):
        return [
            d for d in info["layout_dets"]
            if d["category_id"] == CategoryId.ImageBody
        ]

    # page fully covered by 10 strips -> ONE merged ImageBody
    info = {"layout_dets": []}
    strips = [[0, i * 100, 1000, (i + 1) * 100] for i in range(10)]
    sched._fallback_layout(info, "ocr", None, strips, 1.0, set())
    assert len(bodies(info)) == 1

    # after OCR found text on it, the substrate image is dropped
    for k in range(8):
        info["layout_dets"].append(
            {
                "category_id": CategoryId.Text,
                "poly": [100, 100 * k + 50, 900, 100 * k + 50,
                         900, 100 * k + 90, 100, 100 * k + 90],
                "score": 1.0,
            }
        )
    _drop_scan_substrate_images(info, (1000, 1000))
    assert not bodies(info)

    # picture-only page (no text dets): the full-page image survives
    info = {"layout_dets": []}
    sched._fallback_layout(info, "ocr", None, strips, 1.0, set())
    _drop_scan_substrate_images(info, (1000, 1000))
    assert len(bodies(info)) == 1

    # small figure sliced into two touching halves -> ONE ImageBody,
    # never dropped (below the coverage threshold)
    info = {"layout_dets": []}
    halves = [[100, 100, 300, 200], [100, 200, 300, 300]]
    sched._fallback_layout(info, "ocr", None, halves, 1.0, set())
    _drop_scan_substrate_images(info, (1000, 1000))
    assert len(bodies(info)) == 1
    assert bodies(info)[0]["poly"][:2] == [100, 100]


def test_deferred_ar_packs_across_windows():
    """DeferredAR: formula/table decode regions accumulate across
    analyze_pages calls and resolve in ONE packed batch at flush —
    including formula latex injection into in-table mfd items that were
    collected BEFORE the formulas were decoded."""
    import numpy as np

    from rapiddoc_tpu.pipeline.scheduler import DeferredAR, DocumentAnalyzer
    from rapiddoc_tpu.types import CategoryId

    calls = {"formula": [], "table": []}

    class StubLayout:
        def batch_predict(self, imgs):
            out = []
            for _ in imgs:
                out.append([
                    {"category_id": CategoryId.InterlineEquation_Layout,
                     "poly": [10, 10, 60, 10, 60, 30, 10, 30], "score": 0.9},
                    {"category_id": CategoryId.TableBody,
                     "poly": [5, 5, 90, 5, 90, 90, 5, 90], "score": 0.9},
                ])
            return out

    class StubFormula:
        def batch_predict(self, crops, **kw):
            calls["formula"].append(len(crops))
            return [f"x_{i}" for i in range(len(crops))]

    class StubTable:
        def batch_predict(self, crops, mfd_items=None, fill_items=None):
            calls["table"].append((len(crops), mfd_items))
            return ["<table><tr><td>t</td></tr></table>"] * len(crops)

    an = DocumentAnalyzer(
        layout_model=StubLayout(), formula_model=StubFormula(),
        table_model=StubTable(),
    )
    img = np.full((100, 100, 3), 255, np.uint8)
    deferred = DeferredAR()
    infos_a = an.analyze_pages([img], ["txt"], [None], deferred=deferred)
    infos_b = an.analyze_pages([img], ["txt"], [None], deferred=deferred)
    # nothing decoded yet
    assert calls["formula"] == [] and calls["table"] == []
    for infos in (infos_a, infos_b):
        dets = infos[0]["layout_dets"]
        assert not any(d.get("latex") for d in dets)
        assert not any(d.get("html") for d in dets)

    an.flush_deferred(deferred)
    # one packed call per family covering BOTH windows
    assert calls["formula"] == [2]
    assert len(calls["table"]) == 1 and calls["table"][0][0] == 2
    # mfd items resolved with the (later-decoded) latex
    mfd = calls["table"][0][1]
    assert all(len(items) == 1 and items[0][1].startswith("x_") for items in mfd)
    for infos in (infos_a, infos_b):
        dets = infos[0]["layout_dets"]
        assert any(d.get("latex") for d in dets)
        assert any(d.get("html") for d in dets)
    assert not deferred.formula and not deferred.table


def test_deferred_ar_window_added_and_flush_threshold():
    from rapiddoc_tpu.pipeline.scheduler import DeferredAR

    d = DeferredAR()
    assert d.window_added() == 0
    d.formula.extend([(None, {})] * 3)
    assert d.window_added() == 3
    assert d.window_added() == 0
    assert not d.should_flush()
    d.formula.extend([(None, {})] * DeferredAR.FORMULA_FLUSH)
    assert d.should_flush()


def test_analyzer_serializes_concurrent_calls():
    """Concurrent requests (aio_do_parse / parallel HTTP /file_parse)
    must not interleave inside one analyze call: model wrappers keep
    per-call instance state (round-4 advisor weak #7)."""
    import threading
    import time

    import numpy as np

    from rapiddoc_tpu.pipeline.scheduler import DocumentAnalyzer

    order = []

    class SlowLayout:
        def batch_predict(self, imgs):
            order.append("start")
            time.sleep(0.15)
            order.append("end")
            return [[] for _ in imgs]

    an = DocumentAnalyzer(layout_model=SlowLayout())
    img = np.full((40, 40, 3), 255, np.uint8)

    def work():
        an.analyze_pages([img], ["txt"], [None])

    threads = [threading.Thread(target=work) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert order == ["start", "end"] * 3, order
