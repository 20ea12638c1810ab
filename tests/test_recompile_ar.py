"""Recompile-count regression for the AR decoders (formula / SLANet).

SURVEY hard part #2 for the AR paths: the number of compiled programs
must stay O(shape-buckets x batch-buckets), never O(calls) — varying
crop counts and crop sizes across calls must reuse cached executables.
The jit caches are inspected via PjitFunction._cache_size().
"""
from __future__ import annotations

import numpy as np

from rapiddoc_tpu.models.formula.engine import FormulaConfig, FormulaRecognizer
from rapiddoc_tpu.models.table.slanet import SLANetConfig, SLANetStructure


def test_formula_decode_recompiles_bucket_bound():
    rec = FormulaRecognizer(
        None,
        config=FormulaConfig(
            max_len=16, vocab_size=64, layers=1, backbone_size="B0",
            default_length_bucket=16,
        ),
    )
    rng = np.random.default_rng(0)
    sizes = [(40, 120), (60, 300), (90, 370), (50, 200)]
    for n in (1, 2, 3, 5, 1, 4, 2):
        crops = [
            rng.integers(0, 255, (*sizes[int(rng.integers(len(sizes)))], 3),
                         np.uint8)
            for _ in range(n)
        ]
        rec.batch_predict(crops)
    # one jitted fn per length bucket; its executable cache is bounded by
    # (image shape buckets seen) x (batch buckets seen), here <= 2 x 4
    assert len(rec._compiled) == 1
    (fn,) = rec._compiled.values()
    assert fn._cache_size() <= 8


def test_slanet_decode_recompiles_bucket_bound():
    sla = SLANetStructure(config=SLANetConfig(scale=0.25, neck_ch=32,
                                              hidden=32, max_steps=24))
    rng = np.random.default_rng(1)
    for n in (1, 3, 2, 5, 1, 4):
        imgs = [
            rng.integers(
                0, 255,
                (int(rng.integers(60, 200)), int(rng.integers(80, 300)), 3),
                np.uint8,
            )
            for _ in range(n)
        ]
        sla(imgs)
    # fixed 488 canvas -> only the batch dim varies; counts {1..5} pad to
    # at most 4 batch buckets
    assert sla._fn is not None
    assert sla._fn._cache_size() <= 4


def test_unitable_decode_recompiles_bucket_bound():
    """UNITABLE decode path (reference loop_decode,
    table_structure/unitable/main.py:85-101): varying table counts and
    crop sizes across calls must reuse cached executables — programs are
    O(length-buckets x batch-buckets), never O(calls)."""
    from rapiddoc_tpu.models.table.unitable import (
        UniTableDims,
        UniTableStructure,
    )

    uni = UniTableStructure(
        dims=UniTableDims(
            enc_d=64, enc_layers=1, dec_d=64, dec_layers=1, dec_ffn=128
        )
    )
    rng = np.random.default_rng(2)
    for n in (1, 3, 2, 5, 1, 4):
        imgs = [
            rng.integers(
                0, 255,
                (int(rng.integers(60, 200)), int(rng.integers(80, 300)), 3),
                np.uint8,
            )
            for _ in range(n)
        ]
        uni(imgs, max_len=24)
    # one jitted fn for the single length bucket; fixed 448 canvas ->
    # only the batch dim varies; counts {1..5} pad to <= 4 batch buckets
    assert len(uni._fn) == 1
    (fn,) = uni._fn.values()
    assert fn._cache_size() <= 4
