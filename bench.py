"""End-to-end benchmark: real PDF pages through RapidDoc on one chip.

Primary metric (BASELINE.md): end-to-end pages/sec through
`RapidDoc.__call__` in ocr mode — render, DBNet det, SVTR/CTC rec,
middle-json assembly and markdown emit all included — plus the per-stage
ms/page breakdown utils/trace.py collects. Weights: the published
PP-OCRv6 checkpoints when converted, else the in-repo synthetic-trained
demo checkpoints (real detections + real text either way).

Baseline denominator: the same det/rec networks (the reference's torch
re-implementations, its architecture spec) running the same crops on CPU
— the closest runnable stand-in for the onnxruntime-CPU reference in this
zero-egress environment (BASELINE.md: the reference publishes no speed
numbers).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Env: RAPIDDOC_BENCH_TINY=1 for a small CPU-friendly run,
RAPIDDOC_BENCH_PAGES to override the page count,
RAPIDDOC_BENCH_SKIP_BASELINE=1 to skip the torch-CPU run.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TINY = bool(os.environ.get("RAPIDDOC_BENCH_TINY"))
PAGES = int(os.environ.get("RAPIDDOC_BENCH_PAGES", "2" if TINY else "12"))
DEMO_PDF = "/root/reference/demo/pdfs/demo1.pdf"


def _bench_pdf_bytes() -> bytes:
    """A deterministic multi-page text-image PDF (synthetic rendered
    pages: realistic det/rec load, self-contained, OCR-ground-truthable)."""
    import random

    from PIL import Image

    from rapiddoc_tpu import pdfio
    from rapiddoc_tpu.train.synth import render_page

    rng = random.Random(0)
    size = 320 if TINY else 960
    imgs = [
        Image.fromarray(render_page(rng, size)[0]) for _ in range(PAGES)
    ]
    return pdfio.images_to_pdf(imgs, dpi=144)


def _bench_e2e() -> tuple[float, dict, int]:
    """pages/sec through RapidDoc + per-stage ms/page.

    Default: ALL stages enabled (layout + ocr + formula + table, demo
    checkpoints standing in for the published ones) over a real
    document (demo1.pdf) in ocr mode — the BASELINE.md metric
    definition. RAPIDDOC_BENCH_OCR_ONLY=1 restores the det/rec-only
    synthetic-page run (the round-1 metric, kept for trajectory
    comparison; it is also the fallback when the demo PDF is absent).
    """
    ocr_only = bool(os.environ.get("RAPIDDOC_BENCH_OCR_ONLY")) or TINY
    if ocr_only or not os.path.isfile(DEMO_PDF):
        os.environ.setdefault("RAPIDDOC_DISABLE_LAYOUT", "1")
        os.environ.setdefault("RAPIDDOC_DISABLE_FORMULA", "1")
        os.environ.setdefault("RAPIDDOC_DISABLE_TABLE", "1")
        pdf = _bench_pdf_bytes()
        pages = PAGES
    else:
        os.environ.setdefault("RAPIDDOC_DEMO_LAYOUT", "1")
        from rapiddoc_tpu import pdfio
        from rapiddoc_tpu.cli.common import convert_pdf_bytes_to_bytes_by_pages

        raw = open(DEMO_PDF, "rb").read()
        pages = min(PAGES, len(pdfio.open_pdf(raw)))
        pdf = convert_pdf_bytes_to_bytes_by_pages(raw, 0, pages - 1)
    from rapiddoc_tpu import RapidDoc
    from rapiddoc_tpu.api import stage_report

    doc = RapidDoc()
    # warm run compiles every bucket the document needs
    doc(pdf, parse_method="ocr")
    from rapiddoc_tpu.api import GLOBAL_TRACER

    GLOBAL_TRACER.reset()
    tic = time.perf_counter()
    out = doc(pdf, parse_method="ocr")
    dt = time.perf_counter() - tic
    assert out.markdown  # produced real output
    report = {
        k: v.get("ms_per_item", 0.0) for k, v in stage_report().items()
    }
    return pages / dt, report, pages


def _bench_torch_reference() -> float | None:
    """Reference torch det+rec on CPU over a comparable page workload."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    try:
        import refnets
        import torch
    except ImportError:
        return None
    if not refnets.available():
        return None
    try:
        m = refnets.load("backbones.rec_lcnetv4")
        fpnm = refnets.load("necks.db_fpn")
        headm = refnets.load("heads.det_db_head")
        multim = refnets.load("heads.rec_multi_head")
    except Exception:
        return None
    torch.set_num_threads(os.cpu_count() or 1)

    class Det(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.b = m.PPLCNetV4(det=True, model_size="small")
            self.n = fpnm.RepLKFPN(
                in_channels=self.b.out_channels, out_channels=96,
                dilated_kernel_size=7, shortcut=True,
            )
            self.h = headm.DBHead(
                in_channels=96, k=50, mode="ppocrv6", fix_nan=True,
                kernel_list=[3, 2, 2],
            )

        def forward(self, x):
            return self.h(self.n(self.b(x)))["maps"]

    class Rec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.b = m.PPLCNetV4(det=False, model_size="small")
            self.h = multim.MultiHead(
                in_channels=384,
                out_channels_list={"CTCLabelDecode": 18710},
                head_list=[
                    {"CTCHead": {"Neck": {"name": "lightsvtr", "dims": 120,
                                           "depth": 2, "mlp_ratio": 2.0,
                                           "local_kernel": 7},
                                  "Head": {"fc_decay": 1e-5}}},
                    {"NRTRHead": {"nrtr_dim": 384, "max_text_length": 25}},
                ],
            )

        def forward(self, x):
            out = self.h(self.b(x))
            return out["ctc_logits"] if isinstance(out, dict) else out

    det = Det().eval()
    rec = Rec().eval()
    det_hw = (192, 192) if TINY else (960, 960)
    rec_hw = (48, 80) if TINY else (48, 320)
    crops_per_page = 4 if TINY else 24
    pages = max(1, PAGES // 8)  # reduced workload, extrapolated
    crops = pages * crops_per_page
    rng = np.random.default_rng(0)
    det_x = torch.from_numpy(
        rng.standard_normal((pages, 3, *det_hw), dtype=np.float32)
    )
    rec_x = torch.from_numpy(
        rng.standard_normal((crops, 3, *rec_hw), dtype=np.float32)
    )
    with torch.no_grad():
        det(det_x[:1])  # warm
        tic = time.perf_counter()
        for i in range(0, pages, 2):
            det(det_x[i : i + 2])
        for i in range(0, crops, 32):
            rec(rec_x[i : i + 32])
        dt = time.perf_counter() - tic
    return pages / dt


def main() -> None:
    pps, stages, pages = _bench_e2e()
    base_pps = None
    if not os.environ.get("RAPIDDOC_BENCH_SKIP_BASELINE"):
        try:
            base_pps = _bench_torch_reference()
        except Exception:
            base_pps = None
    vs = round(pps / base_pps, 3) if base_pps else None
    print(
        json.dumps(
            {
                "metric": "e2e_ocr_pages_per_sec",
                "value": round(pps, 3),
                "unit": "pages/sec/chip",
                "vs_baseline": vs,
                "stage_ms_per_page": {
                    k: round(v, 1) for k, v in (stages or {}).items()
                },
                "pages": pages,
            }
        )
    )


if __name__ == "__main__":
    main()
