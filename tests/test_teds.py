"""TEDS table-similarity metric."""


def _t(rows):
    body = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows
    )
    return f"<table>{body}</table>"


def test_identical_is_one():
    from rapiddoc_tpu.utils.teds import teds

    html = _t([["a", "b"], ["c", "d"]])
    assert teds(html, html) == 1.0
    assert teds(html, html, structure_only=True) == 1.0


def test_text_divergence_lowers_teds_not_teds_s():
    from rapiddoc_tpu.utils.teds import teds

    a = _t([["alpha", "beta"], ["gamma", "delta"]])
    b = _t([["xxxxx", "yyyy"], ["zzzzz", "wwwww"]])
    assert teds(a, b) < 1.0
    assert teds(a, b, structure_only=True) == 1.0


def test_structure_divergence():
    from rapiddoc_tpu.utils.teds import teds

    a = _t([["a", "b"], ["c", "d"]])
    b = _t([["a", "b", "x"], ["c", "d", "y"], ["e", "f", "z"]])
    s = teds(a, b, structure_only=True)
    assert 0.0 < s < 1.0
    # missing one cell is closer than missing a whole row+col
    c = _t([["a", "b"], ["c"]])
    assert teds(a, c, structure_only=True) > s


def test_colspan_matters():
    from rapiddoc_tpu.utils.teds import teds

    a = "<table><tr><td colspan=\"2\">h</td></tr><tr><td>a</td><td>b</td></tr></table>"
    b = "<table><tr><td>h</td><td></td></tr><tr><td>a</td><td>b</td></tr></table>"
    assert teds(a, a) == 1.0
    assert teds(a, b, structure_only=True) < 1.0


def test_empty_and_garbage():
    from rapiddoc_tpu.utils.teds import teds

    assert teds("", "") == 1.0
    assert 0.0 <= teds("<table><tr><td>a</td></tr></table>", "") <= 1.0
    assert 0.0 <= teds("not html", "<table><tr><td>a</td></tr></table>") <= 1.0
