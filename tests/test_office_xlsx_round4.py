"""xlsx converter round-4 depth: hidden sheets, auto gap-tolerance
selection, singleton cells as prose, conditional sheet titles
(reference: rapid_doc/model/xlsx/xlsx_converter.py
_iter_sheets_to_convert:275, _select_best_gap_candidate:931,
_can_render_singleton_as_text:743, _should_emit_sheet_titles:297)."""
import io
import zipfile

from rapiddoc_tpu.office.xlsx import xlsx_to_blocks

S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PR = "http://schemas.openxmlformats.org/package/2006/relationships"


def _cell(ref, text):
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def _sheet(rows_xml):
    return (
        f'<?xml version="1.0"?><worksheet xmlns="{S}" '
        f'xmlns:r="{R}"><sheetData>{rows_xml}</sheetData></worksheet>'
    )


def _make_workbook(sheets: dict[str, tuple[str, str]]) -> bytes:
    """sheets: name -> (state, sheet_xml)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types"/>',
        )
        entries = []
        rels = []
        for i, (name, (state, xml)) in enumerate(sheets.items(), 1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", xml)
            st = f' state="{state}"' if state != "visible" else ""
            entries.append(
                f'<sheet name="{name}" sheetId="{i}"{st} r:id="rId{i}"/>'
            )
            rels.append(
                f'<Relationship Id="rId{i}" Type="w" '
                f'Target="worksheets/sheet{i}.xml"/>'
            )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{S}" xmlns:r="{R}">'
            f"<sheets>{''.join(entries)}</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{PR}">'
            f"{''.join(rels)}</Relationships>",
        )
    return buf.getvalue()


GRID = _sheet(
    '<row r="1">' + _cell("A1", "h1") + _cell("B1", "h2") + "</row>"
    '<row r="2">' + _cell("A2", "v1") + _cell("B2", "v2") + "</row>"
)


def test_hidden_sheets_skipped(monkeypatch):
    monkeypatch.delenv("RAPIDDOC_XLSX_INCLUDE_HIDDEN", raising=False)
    wb = _make_workbook({
        "Visible": ("visible", GRID),
        "Secret": ("hidden", _sheet(
            '<row r="1">' + _cell("A1", "secret-data")
            + _cell("B1", "x") + "</row>"
        )),
        "Gone": ("veryHidden", _sheet(
            '<row r="1">' + _cell("A1", "very-secret")
            + _cell("B1", "y") + "</row>"
        )),
    })
    md = xlsx_to_blocks(wb).to_markdown()
    assert "v1" in md
    assert "secret-data" not in md and "very-secret" not in md


def test_hidden_sheets_opt_in(monkeypatch):
    monkeypatch.setenv("RAPIDDOC_XLSX_INCLUDE_HIDDEN", "1")
    wb = _make_workbook({
        "Visible": ("visible", GRID),
        "Secret": ("hidden", _sheet(
            '<row r="1">' + _cell("A1", "secret-data")
            + _cell("B1", "x") + "</row>"
        )),
    })
    md = xlsx_to_blocks(wb).to_markdown()
    assert "secret-data" in md


def test_single_sheet_gets_no_title_noise():
    wb = _make_workbook({"Only": ("visible", GRID)})
    res = xlsx_to_blocks(wb)
    assert not [b for b in res.blocks if b.type == "title"]


def test_multi_sheet_titles_emitted():
    wb = _make_workbook({
        "First": ("visible", GRID),
        "Second": ("visible", GRID),
    })
    res = xlsx_to_blocks(wb)
    titles = [b.text for b in res.blocks if b.type == "title"]
    assert titles == ["First", "Second"]


def test_lone_cell_is_prose_not_table():
    # an isolated note far from the data grid: prose, not a 1x1 table
    sheet = _sheet(
        '<row r="1">' + _cell("A1", "h1") + _cell("B1", "h2") + "</row>"
        '<row r="2">' + _cell("A2", "v1") + _cell("B2", "v2") + "</row>"
        '<row r="9">' + _cell("H9", "standalone note") + "</row>"
    )
    res = xlsx_to_blocks(_make_workbook({"S": ("visible", sheet)}))
    texts = [b.text for b in res.blocks if b.type == "text"]
    tables = [b.html for b in res.blocks if b.type == "table"]
    assert "standalone note" in texts
    assert len(tables) == 1 and "standalone note" not in tables[0]


def test_gap_selection_bridges_single_blank_row_in_dense_table():
    # a dense 4-column table with ONE blank row inside it: gap
    # tolerance 0 would split it in two, but its penalty is within the
    # preference margin of gap 1, which is preferred and bridges the
    # gap (reference: AUTO_GAP_TOLERANCE_PREFERENCE + margin 0.15).
    # A FAR island many rows below stays its own table.
    rows = []
    for r in list(range(1, 10)) + list(range(11, 25)):
        cells = "".join(
            _cell(f"{col}{r}", f"r{r}{col}") for col in "ABCD"
        )
        rows.append(f'<row r="{r}">{cells}</row>')
    rows.append(
        '<row r="40">' + _cell("A40", "far") + _cell("B40", "away") + "</row>"
    )
    rows.append(
        '<row r="41">' + _cell("A41", "x") + _cell("B41", "y") + "</row>"
    )
    res = xlsx_to_blocks(_make_workbook({"S": ("visible", "".join(
        [_sheet("".join(rows))]
    ))}))
    tables = [b.html for b in res.blocks if b.type == "table"]
    assert len(tables) == 2
    assert "r1A" in tables[0] and "r24D" in tables[0]  # bridged
    assert "far" in tables[1]
