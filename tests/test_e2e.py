"""End-to-end tests: PDF/office -> markdown (fuzzy-golden style, per
SURVEY.md §4 — the reference's e2e strategy adapted to this environment:
no trained model weights, so txt-mode pipelines and office docs are the
quality-bearing paths)."""
import os

import pytest

os.environ.setdefault("RAPIDDOC_DISABLE_OCR", "1")

DEMO = "/root/reference/demo"

needs_demo = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="reference demo docs unavailable"
)


@pytest.fixture(scope="module")
def engine():
    from rapiddoc_tpu import RapidDoc

    return RapidDoc(formula_enable=False, table_enable=False)


@needs_demo
def test_pdf_txt_e2e(engine):
    out = engine(os.path.join(DEMO, "pdfs", "demo1.pdf"))
    assert len(out.middle_json["pdf_info"]) == 13
    md = out.markdown
    assert "flow duration curves" in md.replace("ﬂ", "fl")
    assert "Journal of Hydrology" in md
    assert "Abstract" in md
    assert len(out.images) > 0
    assert any(item["type"] == "image" for item in out.content_list_json)
    # reading order: title before abstract
    assert md.index("Journal of Hydrology") < md.index("Abstract")


@needs_demo
def test_pdf_cjk_e2e(engine):
    out = engine(os.path.join(DEMO, "pdfs", "比亚迪财报.pdf"))
    assert "比亚迪" in out.markdown
    assert len(out.middle_json["pdf_info"]) == 9


@needs_demo
def test_docx_e2e(engine):
    out = engine(os.path.join(DEMO, "docx", "demo1-docx.docx"))
    assert "MinerU" in out.markdown
    assert len(out.images) > 0
    assert out.middle_json["_backend"] == "office"


@needs_demo
def test_pptx_e2e(engine):
    out = engine(os.path.join(DEMO, "pptx", "powerpoint_sample.pptx"))
    assert "<table>" in out.markdown
    assert out.content_list_json


@needs_demo
def test_xlsx_e2e(engine):
    out = engine(os.path.join(DEMO, "xlsx", "xlsx_01.xlsx"))
    assert "<table>" in out.markdown
    assert "first" in out.markdown


@needs_demo
def test_image_input(engine):
    import glob

    imgs = sorted(glob.glob(os.path.join(DEMO, "images", "*.jpg"))) + sorted(
        glob.glob(os.path.join(DEMO, "images", "*.png"))
    )
    if not imgs:
        pytest.skip("no demo images")
    out = engine(imgs[0])
    # image inputs go through images->pdf->ocr path; with OCR disabled the
    # output may be empty but must be well-formed
    assert out.middle_json is not None


def test_data_uri_mode(tmp_path):
    from PIL import Image, ImageDraw

    from rapiddoc_tpu import RapidDoc, pdfio

    img = Image.new("RGB", (300, 200), "white")
    ImageDraw.Draw(img).rectangle([40, 40, 260, 160], fill="black")
    pdf = pdfio.images_to_pdf([img])
    p = tmp_path / "t.pdf"
    p.write_bytes(pdf)
    eng = RapidDoc(
        formula_enable=False, table_enable=False, image_output_mode="data_uri",
        parse_method="txt",
    )
    out = eng(str(p))
    assert isinstance(out.markdown, str)


def test_xycut_two_columns():
    from rapiddoc_tpu.reading_order.xycut import sort_boxes_reading_order

    # two-column layout: title spanning both, then left col, then right col
    boxes = [
        [10, 0, 190, 20],  # 0: full-width title
        [10, 30, 90, 60],  # 1: left top
        [10, 70, 90, 100],  # 2: left bottom
        [110, 30, 190, 60],  # 3: right top
        [110, 70, 190, 100],  # 4: right bottom
    ]
    order = sort_boxes_reading_order(boxes)
    assert order[0] == 0
    assert order.index(1) < order.index(2) < order.index(3) < order.index(4)


REF_TEST_PDF = "/root/reference/tests/unittest/pdfs/test.pdf"


@pytest.mark.skipif(not os.path.isfile(REF_TEST_PDF),
                    reason="reference test fixture unavailable")
def test_reference_ci_fixture(engine):
    """The reference CI gate's document (reference:
    tests/unittest/test_e2e.py assert_content fuzzy-golden checks),
    driven through the txt pipeline."""
    out = engine(REF_TEST_PDF)
    md = out.markdown
    # caption goldens (reference checks fuzz.ratio > 90 on these)
    assert "Figure Caption" in md
    assert "Table Caption" in md
    # body-text golden
    assert "Wharton School of the University of Pennsylvania" in md
    # structural variety: images cut + multiple block types present
    assert len(out.images) >= 1
    types = {
        b["type"]
        for p in out.middle_json["pdf_info"]
        for b in p["preproc_blocks"]
    }
    assert {"image", "text"} <= types


@needs_demo
def test_parse_batch_cross_document(engine):
    """Pages of several documents share device batches (reference
    super-batching, pipeline_analyze.py:135-213); outputs must match the
    single-document path."""
    docs = [
        os.path.join(DEMO, "pdfs", "demo4.pdf"),
        os.path.join(DEMO, "docx", "demo1-docx.docx"),  # office mixes in
        os.path.join(DEMO, "pdfs", "示例7-研究报告.pdf"),
    ]
    outs = engine.parse_batch(docs)
    assert len(outs) == 3
    singles = [engine(d) for d in docs]
    for batched, single in zip(outs, singles):
        assert batched.markdown == single.markdown


@needs_demo
def test_docx_textboxes(engine):
    out = engine(os.path.join(DEMO, "docx", "textbox.docx"))
    # 16 flowchart textboxes must surface (previously only 162 chars did)
    assert len(out.markdown) > 1500


@needs_demo
def test_cjk_thesis_template(engine):
    out = engine(os.path.join(DEMO, "pdfs", "示例1-论文模板.pdf"))
    assert len(out.middle_json["pdf_info"]) == 14
    md = out.markdown
    assert "摘要" in md and "关键字" in md
    assert len(md) > 5000
    assert len(out.images) >= 1


def test_extract_original_image():
    """image_config extract_original_image: image spans matching an
    embedded image keep the original pixels (reference:
    docs/analyze_param.md image_config)."""
    from PIL import Image

    from rapiddoc_tpu import RapidDoc, pdfio

    src = Image.new("RGB", (120, 90))
    px = src.load()
    for y in range(90):
        for x in range(120):
            px[x, y] = (x * 2 % 256, y * 2 % 256, 37)
    pdf = pdfio.images_to_pdf([src], dpi=72)
    eng = RapidDoc(formula_enable=False, table_enable=False,
                   parse_method="ocr",
                   image_config={"extract_original_image": True,
                                 "extract_original_image_iou_thresh": 0.5})
    out = eng(pdf)
    assert out.images, "image span extracted"
    blob = next(iter(out.images.values()))
    import io

    got = Image.open(io.BytesIO(blob)).convert("RGB")
    # original-pixel path preserves the exact source dimensions (a
    # screenshot crop would come back at render scale instead)
    assert got.size == src.size
