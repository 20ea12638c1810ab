"""Table stack: mask->cells recovery, grid logic, matcher, engine plumbing."""
import numpy as np
import pytest


def _synthetic_table_mask(rows=3, cols=4, size=256):
    mask = np.zeros((size, size), np.float32)
    xs = np.linspace(10, size - 10, cols + 1).astype(int)
    ys = np.linspace(10, size - 10, rows + 1).astype(int)
    for x in xs:
        mask[ys[0] : ys[-1] + 1, x - 1 : x + 2] = 1.0
    for y in ys:
        mask[y - 1 : y + 2, xs[0] : xs[-1] + 1] = 1.0
    return mask, rows, cols


def test_extract_cells_from_mask():
    from rapiddoc_tpu.models.table.unet import cells_to_grid, extract_cells_from_mask

    mask, rows, cols = _synthetic_table_mask()
    cells = extract_cells_from_mask(mask)
    assert len(cells) == rows * cols
    grid = cells_to_grid(cells)
    assert len(grid) == rows * cols
    assert max(g[0] for g in grid) == rows - 1
    assert max(g[1] for g in grid) == cols - 1


def test_build_html_from_grid():
    from rapiddoc_tpu.models.table.matcher import build_html_from_grid

    grid = [(0, 0, 1, 2), (1, 0, 1, 1), (1, 1, 1, 1)]
    html = build_html_from_grid(grid, ["head", "a", "b"])
    assert 'colspan="2"' in html
    assert html.count("<tr>") == 2
    assert "<td>a</td>" in html and "<td>b</td>" in html


def test_match_ocr_to_cells():
    from rapiddoc_tpu.models.table.matcher import match_ocr_to_cells

    cells = [[0, 0, 50, 50], [50, 0, 100, 50]]
    items = [
        {"bbox": [5, 5, 45, 20], "text": "left"},
        {"bbox": [55, 5, 95, 20], "text": "right"},
        {"bbox": [48, 30, 60, 45], "text": "straddle"},
    ]
    a = match_ocr_to_cells(cells, items)
    assert 0 in a[0] and 1 in a[1]
    assert 2 in a[0] or 2 in a[1]


def test_heuristic_table_kind():
    import cv2

    from rapiddoc_tpu.models.table.cls import heuristic_table_kind

    img = np.full((200, 300, 3), 255, np.uint8)
    for y in np.linspace(10, 190, 5).astype(int):
        cv2.line(img, (10, y), (290, y), (0, 0, 0), 2)
    for x in np.linspace(10, 290, 5).astype(int):
        cv2.line(img, (x, 10), (x, 190), (0, 0, 0), 2)
    assert heuristic_table_kind(img) == "wired"
    blank = np.full((200, 300, 3), 255, np.uint8)
    assert heuristic_table_kind(blank) == "wireless"


def test_table_vocab_roundtrip():
    from rapiddoc_tpu.models.table.unitable import EOS_ID, TableVocab

    v = TableVocab()
    tok_to_id = {t: i for i, t in v.id_to_token.items()}
    ids = [tok_to_id[t] for t in ("<tr>", "<td></td>", "</tr>")]
    toks = v.decode(ids + [EOS_ID, ids[0]])
    assert toks == ["<tr>", "<td></td>", "</tr>"]  # eos stops decode


@pytest.mark.slow
def test_wired_engine_on_synthetic_table():
    import cv2

    from rapiddoc_tpu.models.table.engine import TableRecognizer

    img = np.full((256, 256, 3), 255, np.uint8)
    for y in (20, 100, 180, 236):
        cv2.line(img, (20, y), (236, y), (0, 0, 0), 2)
    for x in (20, 128, 236):
        cv2.line(img, (x, 20), (x, 236), (0, 0, 0), 2)
    rec = TableRecognizer()
    htmls = rec.batch_predict([img])
    assert len(htmls) == 1
    # wired path + random UNet weights: structure may be empty but must not crash
    assert isinstance(htmls[0], str)


def test_slanet_vocab():
    from rapiddoc_tpu.models.table.slanet import SLANetVocab

    v = SLANetVocab()
    assert v.tokens[v.sos_id] == "sos" and v.tokens[v.eos_id] == "eos"
    for t in ("<td></td>", "<td", ">", "</td>", ' colspan="3"'):
        assert t in v.token_to_id


def test_slanet_decode_shapes():
    import jax.numpy as jnp

    from rapiddoc_tpu.models.table.slanet import SLANetConfig, SLANetStructure

    m = SLANetStructure(config=SLANetConfig(scale=0.5, max_steps=12))
    img = (np.random.rand(90, 160, 3) * 255).astype(np.uint8)
    out = m([img, img])
    assert len(out) == 2
    for structure, bboxes in out:
        assert isinstance(structure, list)
        for b in bboxes:
            assert len(b) == 4
            assert b[2] >= b[0] and b[3] >= b[1]


def test_engine_strategy_routing():
    from rapiddoc_tpu.models.table.engine import (
        STRATEGIES,
        TableConfig,
        TableRecognizer,
    )

    assert set(STRATEGIES) >= {
        "unet_slanet_plus", "unet_unitable", "slanet_plus", "unitable", "unet"
    }
    rec = TableRecognizer(TableConfig(strategy="unet"))
    assert rec.wireless is None and rec.wired is not None
    with pytest.raises(ValueError):
        TableRecognizer(TableConfig(strategy="nope"))


def test_img2table_opencv_extract():
    import cv2

    from rapiddoc_tpu.models.table.img2table import opencv_table_extract

    img = np.full((300, 400, 3), 255, np.uint8)
    for y in (20, 110, 200, 280):
        cv2.line(img, (20, y), (380, y), (0, 0, 0), 2)
    for x in (20, 140, 260, 380):
        cv2.line(img, (x, 20), (x, 280), (0, 0, 0), 2)
    cells, grid = opencv_table_extract(img)
    assert len(cells) == 9
    assert max(g[0] for g in grid) == 2 and max(g[1] for g in grid) == 2
    blank = np.full((300, 400, 3), 255, np.uint8)
    assert opencv_table_extract(blank) == ([], [])


def test_blank_cell_retry():
    from rapiddoc_tpu.models.table.engine import TableConfig, TableRecognizer

    calls = []

    class FakeOcr:
        def __call__(self, imgs, **kw):
            calls.append(imgs[0].shape)
            return [[{"box": [[1, 1], [20, 1], [20, 10], [1, 10]],
                      "text": "found"}]]

    rec = TableRecognizer(
        TableConfig(strategy="unet", enable_blank_cell_rec=True,
                    detect_rotation=False),
        ocr_system=FakeOcr(),
    )
    texts = rec._retry_blank_cells(
        np.full((100, 100, 3), 255, np.uint8),
        [[10, 10, 60, 40]], [""],
    )
    assert texts == ["found"]


def test_cells_to_grid_spans_and_jitter():
    from rapiddoc_tpu.models.table.unet import cells_to_grid

    # 2x2 grid with a header row spanning both columns; jittered edges
    cells = [
        [10.0, 10.0, 210.0, 50.0],     # header spans both cols
        [11.0, 52.0, 108.0, 90.0],     # r1c0 (jittered +1/-2)
        [112.0, 51.0, 210.0, 91.0],    # r1c1
        [10.0, 93.0, 110.0, 130.0],    # r2c0
        [111.0, 92.0, 209.0, 131.0],   # r2c1
    ]
    grid = cells_to_grid(cells)
    assert grid[0] == (0, 0, 1, 2)  # colspan 2
    assert grid[1][:2] == (1, 0) and grid[2][:2] == (1, 1)
    assert grid[3][:2] == (2, 0) and grid[4][:2] == (2, 1)
    assert all(g[2] == 1 and g[3] == 1 for g in grid[1:])


def test_in_table_formula_injection():
    from rapiddoc_tpu.models.table.engine import TableConfig, TableRecognizer

    rec = TableRecognizer(
        TableConfig(strategy="unet", detect_rotation=False)
    )
    texts = rec._cell_texts(
        np.full((100, 200, 3), 255, np.uint8),
        [[0, 0, 100, 50], [100, 0, 200, 50]],
        mfd=[([110.0, 10.0, 190.0, 40.0], "x^2+y^2")],
    )
    assert texts[0] == ""
    assert texts[1] == "$x^2+y^2$"


def test_in_table_image_uuid_placeholder():
    """In-table images become uuid placeholders in their cell and resolve
    to <img> tags at save time (reference: rapid_table.py fill_image_res +
    pdf_image_tools.save_table_fill_image)."""
    import cv2

    from rapiddoc_tpu.models.table.engine import TableRecognizer

    img = np.full((256, 256, 3), 255, np.uint8)
    for y in (20, 128, 236):
        cv2.line(img, (20, y), (236, y), (0, 0, 0), 2)
    for x in (20, 128, 236):
        cv2.line(img, (x, 20), (x, 236), (0, 0, 0), 2)
    # a "photo" in the bottom-right cell
    img[150:220, 150:220] = 64
    rec = TableRecognizer()
    uid = "f" * 32
    htmls = rec.batch_predict(
        [img], fill_items=[[([150, 150, 220, 220], uid)]]
    )
    assert htmls[0] and uid in htmls[0]

    # save-time resolution: uuid -> <img src="images/...">
    from PIL import Image

    from rapiddoc_tpu.types import ContentType
    from rapiddoc_tpu.utils.images import cut_span_images

    span = {
        "type": ContentType.TABLE,
        "bbox": [0, 0, 256, 256],
        "html": htmls[0],
        "fill_images": [{"uuid": uid, "bbox": [150, 150, 220, 220]}],
    }
    page_info = {
        "preproc_blocks": [
            {"type": "table", "bbox": [0, 0, 256, 256],
             "lines": [{"bbox": [0, 0, 256, 256], "spans": [span]}]}
        ]
    }
    written = {}

    class W:
        def write(self, name, data):
            written[name] = data

    cut_span_images(page_info, Image.fromarray(img), 1.0, W())
    assert uid not in span["html"]
    assert '<img src="images/' in span["html"]
    assert written  # the crop was saved


def test_batch_chunks_closed_set():
    """AR decoders pad batch dims to a closed bucket set (anti-recompile)."""
    from rapiddoc_tpu.engine.buckets import batch_chunks, pad_rows

    sizes = (1, 2, 4, 8, 16)
    for n in range(1, 60):
        chunks = batch_chunks(n, sizes)
        assert sum(e - s for s, e, _ in chunks) == n
        assert all(p in sizes for _, _, p in chunks)
        assert all(p >= e - s for s, e, p in chunks)
    padded = pad_rows(np.zeros((3, 2, 2), np.uint8), 8)
    assert padded.shape == (8, 2, 2)


def test_slanet_batch_recompile_bound():
    """Varying table counts must not grow the jit cache beyond the
    closed batch-bucket set (ROADMAP: extend recompile-count regression
    tests to formula/table decoders)."""
    from rapiddoc_tpu.models.table.slanet import SLANetConfig, SLANetStructure

    m = SLANetStructure(config=SLANetConfig(scale=0.5, max_steps=6))
    img = (np.random.rand(60, 90, 3) * 255).astype(np.uint8)
    for n in (1, 2, 3, 2, 1, 4, 3):
        out = m([img] * n)
        assert len(out) == n
    # batches padded to {1, 2, 4} -> at most 3 traced programs
    assert m._compiled()._cache_size() <= 3


def test_img2table_borderless_extract():
    """Whitespace-corridor borderless extraction: OCR word boxes with a
    clear 3-column layout become a 3-column HTML table with merged-cell
    colspans (role parity: external img2table borderless_tables=True,
    reference rapid_table.py:228-237)."""
    from rapiddoc_tpu.models.table.img2table import borderless_table_extract

    rows_spec = [
        [("Name", 10, 80), ("Qty", 140, 180), ("Price", 240, 300)],
        [("Apple", 10, 90), ("3", 150, 162), ("1.20", 245, 290)],
        [("Banana", 10, 100), ("12", 148, 170), ("0.55", 245, 290)],
        [("Total due today", 10, 195), ("14.45", 245, 300)],  # colspan 2
    ]
    items = []
    for r, row in enumerate(rows_spec):
        y0 = 10 + r * 30
        for text, x0, x1 in row:
            items.append(([x0, y0, x1, y0 + 18], text))
    html = borderless_table_extract(items, (140, 320))
    assert html.startswith("<table>")
    assert html.count("<tr>") == 4
    assert "<td>Name</td>" in html and "<td>Qty</td>" in html
    assert 'colspan="2">Total due today' in html
    assert "<td>14.45</td>" in html


def test_img2table_borderless_rejects_plain_text():
    """Paragraph-like single-column boxes must NOT fabricate a table."""
    from rapiddoc_tpu.models.table.img2table import borderless_table_extract

    items = [
        ([10, 10 + 24 * i, 300, 28 + 24 * i], f"full width text line {i}")
        for i in range(6)
    ]
    assert borderless_table_extract(items, (200, 320)) == ""
