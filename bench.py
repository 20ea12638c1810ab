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
# per-document workload counts measured by the e2e run (filled by
# _bench_e2e; sizes the reference-CPU denominator to the same work)
WORKLOAD: dict | None = None


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
    from rapiddoc_tpu.api import GLOBAL_TRACER
    from rapiddoc_tpu.engine.session import session_stats_report

    # warm until no session compiles a new bucket (a second-pass path —
    # e.g. det merged-blob refinement — can hit a bucket the first pass
    # never touched; a compile inside the timed run would dominate it)
    compiles = -1
    for _ in range(3):
        doc(pdf, parse_method="ocr")
        now = sum(s["compiles"] for s in session_stats_report().values())
        if now == compiles:
            break
        compiles = now

    before_rec = {
        k: v["items"] for k, v in session_stats_report().items()
    }
    GLOBAL_TRACER.reset()
    tic = time.perf_counter()
    out = doc(pdf, parse_method="ocr")
    dt = time.perf_counter() - tic
    assert out.markdown  # produced real output
    rep = stage_report()
    for k, v in rep.items():
        print(f"[stage] {k}: {v}", file=sys.stderr)
    # real per-document workload counts, for an apples-to-apples
    # reference-CPU denominator
    after = session_stats_report()
    global WORKLOAD
    WORKLOAD = {
        "rec_crops": after.get("ocr_rec", {}).get("items", 0)
        - before_rec.get("ocr_rec", 0),
        "formula_regions": rep.get("formula", {}).get("items", 0),
        "table_regions": rep.get("table", {}).get("items", 0),
    }
    print(f"[workload] {WORKLOAD}", file=sys.stderr)
    # normalize every stage by PAGES (stage items differ: formula/table
    # stages count regions, ocr counts pages — ms/page is the comparable
    # unit BASELINE.md asks for)
    report = {
        k: v.get("total_s", 0.0) * 1000.0 / pages
        for k, v in stage_report().items()
    }
    # transfer accounting (stderr, not the JSON contract line): on a
    # tunneled chip bytes+roundtrips, not FLOPs, set the ceiling
    from rapiddoc_tpu.engine.session import session_stats_report

    for name, st in session_stats_report().items():
        print(
            f"[session] {name}: calls={st['calls']} "
            f"in={st['bytes_in']/1e6:.1f}MB out={st['bytes_out']/1e6:.1f}MB "
            f"compiles={st['compiles']}",
            file=sys.stderr,
        )
    # transfer-vs-compute split: measured wire constants x observed byte
    # counters — separates what a faster link would fix from what the
    # chip actually spends computing
    from rapiddoc_tpu.engine.session import (
        measure_wire_bandwidth,
        transfer_split_report,
    )

    try:
        print(f"[wire] {measure_wire_bandwidth()}", file=sys.stderr)
        split = transfer_split_report()
        for name, tr in split.items():
            stage_ms = rep.get(name, {}).get("total_s", 0.0) * 1e3
            print(
                f"[split] {name}: transfer~{tr['transfer_ms_est']:.0f}ms "
                f"compute~{max(stage_ms - tr['transfer_ms_est'], 0.0):.0f}ms "
                f"of {stage_ms:.0f}ms stage wall",
                file=sys.stderr,
            )
    except Exception:
        import traceback

        traceback.print_exc()
    return pages / dt, report, pages


def _bench_published_dims() -> dict:
    """Stage costs at PUBLISHED architecture dims (random-init where the
    converted weights are absent) — the e2e run uses demo-size layout
    and formula nets, whose speed does not predict deployment. Measured
    here on the same document images:

    - layout: RT-DETR B4 at 800^2 with the V3 mask branch (reference:
      model_handler/pp_doclayout/main.py:17-29), ms/page warm.
    - formula: PPHGNetV2-B6 encoder + 6x512 MBart decoder, vocab 50000
      (reference: pp_formulanet_arch_config.yaml:12), length bucket 256.
      Random init emits no EOS, so the decode runs the FULL bucket —
      ms/region is the worst case and ms/step is exact (256 steps).
    """
    import cv2

    from rapiddoc_tpu.pdfio.render import render_pdf_page

    out: dict = {}
    raw = open(DEMO_PDF, "rb").read()
    n_pages = 4
    pages = [
        np.asarray(render_pdf_page(raw, i, dpi=144).convert("RGB"))
        for i in range(n_pages)
    ]

    # ---- layout at published dims
    from rapiddoc_tpu.models.layout.engine import LayoutDetector

    layout = LayoutDetector.build({"allow_random_init": True})
    layout.batch_predict(pages)  # warm (compile)
    tic = time.perf_counter()
    layout.batch_predict(pages)
    out["layout_ms_per_page"] = round(
        (time.perf_counter() - tic) * 1e3 / n_pages, 1
    )

    # ---- formula at published dims
    from rapiddoc_tpu.models.formula.engine import (
        FormulaConfig,
        FormulaRecognizer,
    )

    LEN_BUCKET = 256
    rec = FormulaRecognizer(config=FormulaConfig())  # B6, 6x512, 50k vocab
    crops = []
    for i in range(4):
        crop = np.full((64 + 16 * i, 320 + 64 * i, 3), 255, np.uint8)
        cv2.putText(crop, "E=mc2", (10, 40), cv2.FONT_HERSHEY_SIMPLEX,
                    1.0, (0, 0, 0), 2)
        crops.append(crop)
    rec.batch_predict(crops, length_bucket=LEN_BUCKET)  # warm (compile)
    tic = time.perf_counter()
    rec.batch_predict(crops, length_bucket=LEN_BUCKET)
    dt = time.perf_counter() - tic
    out["formula_ms_per_region"] = round(dt * 1e3 / len(crops), 1)
    out["formula_ms_per_step"] = round(dt * 1e3 / LEN_BUCKET, 2)
    out["formula_len_bucket"] = LEN_BUCKET
    return out


FORMULA_STEPS_PER_SEQ = 96  # conservative; published max_new_tokens 1536


def _bench_torch_reference() -> float | None:
    """Reference-CPU pages/sec over the SAME measured workload, computed
    from persisted per-unit costs (BASELINE_CPU.json, written once by
    rapiddoc_tpu.tools.measure_baseline_cpu — each stage measured in a
    time-boxed subprocess). Computing from persisted unit costs means a
    flaky multi-minute torch run can never null the speed gate at bench
    time; re-measurement happens only when the file is absent."""
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json"
    )
    if not os.path.isfile(baseline_path):
        print(
            "[baseline] BASELINE_CPU.json missing — measuring now "
            "(time-boxed per stage)...",
            file=sys.stderr,
        )
        from rapiddoc_tpu.tools.measure_baseline_cpu import run_all

        run_all()
    costs = json.load(open(baseline_path))["unit_costs_ms"]

    wl = WORKLOAD or {}
    pages = PAGES
    crops = int(wl.get("rec_crops") or pages * 24)
    n_formula = int(wl.get("formula_regions") or 0)
    n_table = int(wl.get("table_regions") or 0)

    det_s = pages * costs["det_ms_per_page"] / 1e3
    rec_s = crops * costs["rec_ms_per_crop"] / 1e3
    layout_s = pages * costs.get("layout_ms_per_page", 0.0) / 1e3
    formula_s = n_formula * (
        costs.get("formula_enc_ms_per_region", 0.0)
        + FORMULA_STEPS_PER_SEQ * costs.get("formula_step_ms", 0.0)
    ) / 1e3
    table_s = n_table * costs.get("table_unet_ms_per_region", 0.0) / 1e3
    total = det_s + rec_s + layout_s + formula_s + table_s
    if total <= 0:
        raise RuntimeError(f"degenerate baseline costs: {costs}")
    print(
        f"[baseline] layout={layout_s:.1f}s det={det_s:.1f}s "
        f"rec={rec_s:.1f}s formula={formula_s:.1f}s table={table_s:.1f}s "
        f"total={total:.1f}s for {pages}p/{crops}c/{n_formula}f/{n_table}t "
        f"(per-unit costs from BASELINE_CPU.json)",
        file=sys.stderr,
    )
    return pages / total


def _device_available(timeout_s: float = 180.0) -> bool:
    """Probe TPU availability in a subprocess — a dead axon tunnel makes
    jax.devices() hang forever, which must not take the bench with it."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    global TINY, PAGES
    tpu_down = not _device_available()
    if tpu_down:
        # fall back to a CPU-tiny run: a degraded-but-real measurement
        # beats a hung process when the device tunnel is down
        print("[bench] TPU unavailable; CPU-tiny fallback", file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
        TINY = True
        PAGES = min(PAGES, 2)
    pps, stages, pages = _bench_e2e()
    published = None
    if (
        not TINY
        and not tpu_down
        and not os.environ.get("RAPIDDOC_BENCH_SKIP_PUBLISHED")
        and os.path.isfile(DEMO_PDF)
    ):
        try:
            published = _bench_published_dims()
            print(f"[published-dims] {published}", file=sys.stderr)
        except Exception:
            import traceback

            traceback.print_exc()
    base_pps = None
    if not os.environ.get("RAPIDDOC_BENCH_SKIP_BASELINE"):
        try:
            base_pps = _bench_torch_reference()
        except Exception:
            # never silently null the gate — show exactly what broke
            import traceback

            traceback.print_exc()
            base_pps = None
    vs = round(pps / base_pps, 3) if base_pps else None
    import jax

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
                **({"published_dims": published} if published else {}),
                "platform": jax.default_backend(),
                **(
                    {
                        "tpu_unavailable": True,
                        "note": (
                            "axon TPU tunnel unreachable at bench time; "
                            "this is a 1-core CPU-host fallback (tiny "
                            "pages, cold XLA compiles), NOT the chip "
                            "metric. Last chip-measured warm e2e: see "
                            "ROADMAP.md Performance section."
                        ),
                    }
                    if tpu_down
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
