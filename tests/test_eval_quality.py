"""Quality eval harness: edit distance, TEDS pairing, order inversions."""


def test_normalized_edit_distance():
    from rapiddoc_tpu.tools.eval_quality import normalized_edit_distance as ed

    assert ed("abc", "abc") == 0.0
    assert ed("", "abc") == 1.0
    assert 0 < ed("abcd", "abce") < 0.5


def test_order_inversion_rate():
    from rapiddoc_tpu.tools.eval_quality import order_inversion_rate

    gt = ["the first paragraph here", "second paragraph body",
          "third closing paragraph"]
    assert order_inversion_rate(list(gt), gt) == 0.0
    swapped = [gt[1], gt[0], gt[2]]
    assert order_inversion_rate(swapped, gt) > 0.0


def test_evaluate_doc_end_to_end():
    from rapiddoc_tpu.tools.eval_quality import evaluate_doc

    md = ("Intro paragraph.\n\n"
          "<table><tr><td>a</td><td>b</td></tr></table>\n\n"
          "Closing paragraph.")
    gt = {
        "text": "Intro paragraph. a b Closing paragraph.",
        "tables": ["<table><tr><td>a</td><td>b</td></tr></table>"],
        "paragraphs": ["Intro paragraph.", "Closing paragraph."],
    }
    scores = evaluate_doc(md, gt)
    assert scores["table_teds"] == 1.0
    assert scores["table_teds_s"] == 1.0
    assert scores["order_edit"] == 0.0
    assert scores["text_edit"] < 0.35


def test_eval_cli_end_to_end(tmp_path):
    import json
    import os
    import shutil

    demo = "/root/reference/demo/pdfs/demo4.pdf"
    if not os.path.isfile(demo):
        import pytest

        pytest.skip("reference demo unavailable")
    from rapiddoc_tpu.tools.eval_quality import main

    shutil.copy(demo, tmp_path / "doc.pdf")
    gt = {
        "doc.pdf": {
            # loose ground truth: a fragment the txt pipeline must recover
            "text": "",
            "paragraphs": [],
        }
    }
    # derive GT from a first parse so the metric self-consistency is exact
    from rapiddoc_tpu import RapidDoc

    md = RapidDoc(formula_enable=False, table_enable=False,
                  parse_method="txt")(str(tmp_path / "doc.pdf")).markdown
    paras = [p for p in md.split("\n\n") if len(p.split()) > 4][:3]
    gt["doc.pdf"]["text"] = md
    gt["doc.pdf"]["paragraphs"] = paras
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt), encoding="utf-8")
    out_path = tmp_path / "report.json"
    rc = main([str(tmp_path), str(gt_path), "-o", str(out_path),
               "--parse-method", "txt"])
    assert rc == 0
    report = json.loads(out_path.read_text())
    assert report["aggregate"]["text_edit"] < 0.05
    assert report["aggregate"]["order_edit"] == 0.0
