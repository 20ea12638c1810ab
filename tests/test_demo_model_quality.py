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
    # AND-gated at achieved-minus-margin (achieved small/full:
    # recall 0.83/0.82, precision 1.0/0.98, cls_acc 1.0/1.0) — a
    # 10-point drop in any metric fails the suite
    assert m["recall"] >= 0.8, m
    assert m["cls_acc"] >= 0.9, m
    assert m["precision"] >= 0.9, m


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
    # AND-gated at achieved-minus-margin (achieved small/full:
    # seq_acc 0.5/0.75, teds_s 0.95/0.976, cell_iou 0.58/0.79);
    # teds_s is continuous so it bites even at small N
    assert m["seq_acc"] >= 0.5, m
    assert m["teds_s"] >= 0.9, m
    assert m["cell_iou"] >= 0.5, m


def test_table_unitable_demo_quality():
    v = _vars_or_skip("table_unitable_demo.npz")
    from rapiddoc_tpu.train.unitable import eval_unitable

    m = eval_unitable(v, n=_n(3, 8))
    # AND-gated on the continuous metrics (achieved small/full:
    # teds_s 0.83/0.82, cell_iou 0.41/0.48). Exact-sequence match on a
    # published-size AR decoder is near-zero at demo training scale and
    # quantizes to 1/3 at small N, so it cannot carry a stable gate —
    # TEDS-S is the structure-quality signal that bites (a 10-point
    # drop fails), cell IoU guards the bbox head.
    assert m["teds_s"] >= 0.7, m
    assert m["cell_iou"] >= 0.35, m


def test_formula_demo_quality():
    import json

    meta_path = DEMO_ASSETS_DIR / "formula_demo.json"
    if not meta_path.is_file():
        pytest.skip("formula_demo not trained yet")
    v = _vars_or_skip("formula_demo.npz")
    vocab = json.loads(meta_path.read_text())["vocab"]
    from rapiddoc_tpu.train.formula import evaluate

    m = evaluate(v, vocab, n=_n(4, 8))
    # AND-gated (achieved small/full: exact 0.5/0.25, cer~ 0.03/0.19);
    # cer~ is continuous, so a real recognition regression moves it
    # even when the quantized exact rate holds
    assert m["exact"] >= 0.25, m
    assert m["cer~"] <= 0.3, m


def test_orientation_demo_quality():
    v = _vars_or_skip("orientation_demo.npz")
    from rapiddoc_tpu.train.orientation import evaluate

    acc = evaluate(v, n=_n(8, 16))
    assert acc >= 0.875, acc  # demo checkpoint achieves 0.975 at full N
