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
