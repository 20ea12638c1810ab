"""Quality gates for the synthetic-trained demo checkpoints.

Each test loads the shipped asset (skip when the asset has not been
trained yet) and asserts detection/recognition quality on held-out
synthetic samples through the PRODUCTION inference paths — the same
pattern as test_ocr_quality.py. The DEFAULT suite runs a small-N
version of every gate (a quality regression in any family fails plain
`pytest`); RAPIDDOC_RUN_SLOW=1 runs the full-N version with the same
thresholds on a bigger sample.
"""
from __future__ import annotations

import os

import pytest

from rapiddoc_tpu.models.registry import DEMO_ASSETS_DIR, _load_variables

SLOW = bool(os.environ.get("RAPIDDOC_RUN_SLOW"))


def _n(small: int, full: int) -> int:
    """Sample size: small in the default suite, full under RUN_SLOW."""
    return full if SLOW else small


def _vars_or_skip(name: str):
    v = _load_variables(DEMO_ASSETS_DIR / name)
    if v is None:
        pytest.skip(f"{name} not trained yet")
    return v


def test_layout_demo_quality():
    v = _vars_or_skip("layout_demo.npz")
    from rapiddoc_tpu.train.layout import evaluate

    m = evaluate(v, n_pages=_n(2, 6))
    # block-level recall plus label accuracy on matched blocks
    assert m["recall"] >= 0.7, m
    assert m["cls_acc"] >= 0.7, m
    assert m["precision"] >= 0.65, m


def test_table_unet_demo_quality():
    v = _vars_or_skip("table_unet_demo.npz")
    from rapiddoc_tpu.train.table import eval_unet

    recall = eval_unet(v, n_tables=_n(2, 4))
    assert recall >= 0.9, recall


def test_table_cls_demo_quality():
    v = _vars_or_skip("table_cls_demo.npz")
    from rapiddoc_tpu.train.table import eval_cls

    acc = eval_cls(v, n=_n(8, 16))
    assert acc >= 0.85, acc


def test_table_slanet_demo_quality():
    v = _vars_or_skip("table_slanet_demo.npz")
    from rapiddoc_tpu.train.table import eval_slanet

    m = eval_slanet(v, n=_n(4, 12))
    # exact structure-token sequences are a hard target; cell-box IoU
    # catches regressions even when a span token flips
    assert m["seq_acc"] >= 0.4 or m["cell_iou"] >= 0.5, m


def test_table_unitable_demo_quality():
    v = _vars_or_skip("table_unitable_demo.npz")
    from rapiddoc_tpu.train.unitable import eval_unitable

    m = eval_unitable(v, n=_n(3, 8))
    # published-size AR decoder on a demo-scale synthetic corpus: exact
    # sequences are hard; bbox IoU catches regressions either way
    assert m["seq_acc"] >= 0.3 or m["cell_iou"] >= 0.5, m


def test_formula_demo_quality():
    import json

    meta_path = DEMO_ASSETS_DIR / "formula_demo.json"
    if not meta_path.is_file():
        pytest.skip("formula_demo not trained yet")
    v = _vars_or_skip("formula_demo.npz")
    vocab = json.loads(meta_path.read_text())["vocab"]
    from rapiddoc_tpu.train.formula import evaluate

    m = evaluate(v, vocab, n=_n(4, 8))
    assert m["exact"] >= 0.25 or m["cer~"] <= 0.3, m


def test_orientation_demo_quality():
    v = _vars_or_skip("orientation_demo.npz")
    from rapiddoc_tpu.train.orientation import evaluate

    acc = evaluate(v, n=_n(8, 16))
    assert acc >= 0.875, acc  # demo checkpoint achieves 0.975 at full N
