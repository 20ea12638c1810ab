"""Wired/wireless arbitration + rotation heuristic + text normalize."""
import numpy as np


def _tbl(cells):
    rows = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
        for row in cells
    )
    return f"<table>{rows}</table>"


def test_count_cells_and_blanks():
    from rapiddoc_tpu.models.table.select import count_blank_cells, count_cells

    html = _tbl([["a", "", "c"], ["", "e", "f"]])
    assert count_cells(html) == 6
    assert count_blank_cells(html) == 2


def test_select_prefers_fuller_result():
    from rapiddoc_tpu.models.table.select import select_best_table_html

    ocr = ["alpha", "beta", "gamma", "delta"]
    wired = _tbl([["alpha", "beta"], ["gamma", "delta"]])
    wireless = _tbl([["alpha", ""], ["", ""]])
    assert select_best_table_html(ocr, wired, wireless) == wired
    # wired missing most text and cells -> wireless wins
    wired_bad = _tbl([["alpha"]])
    wireless_good = _tbl([["alpha", "beta"], ["gamma", "delta"]])
    assert select_best_table_html(ocr, wired_bad, wireless_good) == wireless_good


def test_normalize_cell_text_cjk():
    from rapiddoc_tpu.models.table.select import normalize_cell_text

    assert normalize_cell_text("中 国 人") == "中国人"
    assert normalize_cell_text("hello world") == "hello world"
    assert normalize_cell_text("值 ， 下") == "值，下"


def test_detect_table_rotation():
    from rapiddoc_tpu.models.table.select import detect_table_rotation

    class FakeDet:
        def __call__(self, imgs):
            class R:
                # all boxes tall+narrow -> vertical text
                boxes = np.array([
                    [[10, 10], [20, 10], [20, 80], [10, 80]],
                    [[30, 10], [40, 10], [40, 90], [30, 90]],
                ], np.float32)
            return [R()]

    portrait = np.zeros((300, 100, 3), np.uint8)
    landscape = np.zeros((100, 300, 3), np.uint8)
    assert detect_table_rotation(portrait, FakeDet())
    assert not detect_table_rotation(landscape, FakeDet())  # aspect gate
    assert not detect_table_rotation(portrait, None)
