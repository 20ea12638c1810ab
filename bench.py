"""End-to-end benchmark: real PDF pages through RapidDoc on one chip.

Primary metric (BASELINE.md): end-to-end pages/sec through
`RapidDoc.__call__` in ocr mode — render, DBNet det, SVTR/CTC rec,
middle-json assembly and markdown emit all included — plus the per-stage
ms/page breakdown utils/trace.py collects, per-stage FLOPs/MFU from
engine/flops.py, and a per-doc-type corpus breakdown (english paper /
CJK scan / table-heavy / formula-dense).

Baseline denominator: torch-eager on THIS host's single CPU core
(BASELINE_CPU.json) — the closest runnable stand-in for the
onnxruntime-CPU reference in this zero-egress environment (onnxruntime
is not installed; the reference publishes no speed numbers). The JSON
line carries `baseline_kind` and an in-band caveat so the ratio cannot
be mistaken for the BASELINE.md "vs onnxruntime-CPU on v5e-8" gate.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Env: RAPIDDOC_BENCH_TINY=1 for a small CPU-friendly run,
RAPIDDOC_BENCH_PAGES to override the page count,
RAPIDDOC_BENCH_SKIP_BASELINE=1 to skip the torch-CPU denominator,
RAPIDDOC_BENCH_SKIP_CORPUS=1 to skip the per-doc-type sweep,
RAPIDDOC_BENCH_FORMULA_FULL=1 to also time the 2560-token bucket.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# hang diagnosis: dump all thread stacks to stderr if a phase exceeds
# the watchdog budget (tunnel RPCs can wedge; a stack dump beats a
# silent stall). Repeats every interval until the run completes.
_WATCHDOG_S = int(os.environ.get("RAPIDDOC_BENCH_WATCHDOG", "600") or 0)
if _WATCHDOG_S > 0:
    import faulthandler

    faulthandler.dump_traceback_later(_WATCHDOG_S, repeat=True, exit=False)

TINY = bool(os.environ.get("RAPIDDOC_BENCH_TINY"))
PAGES = int(os.environ.get("RAPIDDOC_BENCH_PAGES", "2" if TINY else "56"))
DEMO_PDF = "/root/reference/demo/pdfs/demo1.pdf"
CJK_PDF = "/root/reference/demo/pdfs/比亚迪财报.pdf"
# per-document workload counts measured by the e2e run (filled by
# _bench_e2e; sizes the reference-CPU denominator to the same work)
WORKLOAD: dict | None = None

# program name (engine/flops.py track) -> tracer stage name
_PROGRAM_STAGE = {
    "layout": "layout",
    "ocr_det": "ocr_det",
    "ocr_rec": "ocr_rec",
    "formula": "formula",
    "table_unitable": "table",
    "table_slanet": "table",
    "table_unet": "table",
    "table_cls": "table",
    "orientation": "orientation",
}


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


def _synth_corpus_pdf(kind: str, n_pages: int) -> bytes:
    """Table-heavy / formula-dense fixture pages (labeled synth pages at
    960px width — the same generator the demo layout checkpoint was
    trained on, so layout actually routes regions to table/formula)."""
    import random

    from PIL import Image

    from rapiddoc_tpu import pdfio
    from rapiddoc_tpu.train.synth_layout import render_layout_page

    # cumulative cuts: (paragraph, heading, figure, table); rest=formula
    mix = {
        "table_heavy": (0.18, 0.24, 0.28, 0.92),
        "formula_dense": (0.22, 0.28, 0.32, 0.36),
    }[kind]
    rng = random.Random(7 if kind == "table_heavy" else 11)
    imgs = [
        Image.fromarray(
            render_layout_page(rng, size=760, height=1000, mix=mix)[0]
        )
        for _ in range(n_pages)
    ]
    return pdfio.images_to_pdf(imgs, dpi=144)


def _composite_corpus_pdf(total_pages: int) -> tuple[bytes, dict]:
    """ONE mixed document for the headline e2e (VERDICT r4: 12 pages /
    4 formula regions is too small-N for formula/table conclusions):
    real english-paper pages + CJK report pages (both rasterized — the
    headline runs ocr mode) + table-heavy + formula-dense + plain synth
    text pages, proportionally scaled to `total_pages` (default 56)."""
    import random

    from PIL import Image

    from rapiddoc_tpu import pdfio
    from rapiddoc_tpu.pdfio.render import render_pdf_page
    from rapiddoc_tpu.train.synth import render_page
    from rapiddoc_tpu.train.synth_layout import render_layout_page

    plan = [  # (kind, share of total)
        ("demo1", 12 / 56), ("cjk", 8 / 56), ("table_heavy", 12 / 56),
        ("formula_dense", 12 / 56), ("synth_text", 12 / 56),
    ]
    mix = {
        "table_heavy": (0.18, 0.24, 0.28, 0.92),
        "formula_dense": (0.22, 0.28, 0.32, 0.36),
    }
    imgs: list[Image.Image] = []
    counts: dict[str, int] = {}
    for kind, share in plan:
        n = max(1, round(total_pages * share))
        if kind in ("demo1", "cjk"):
            path = DEMO_PDF if kind == "demo1" else CJK_PDF
            if not os.path.isfile(path):
                counts[kind] = 0
                continue
            raw = open(path, "rb").read()
            avail = len(__import__("rapiddoc_tpu").pdfio.open_pdf(raw))
            n = min(n, avail)
            for i in range(n):
                imgs.append(render_pdf_page(raw, i, dpi=144).convert("RGB"))
        elif kind == "synth_text":
            rng = random.Random(0)
            for _ in range(n):
                imgs.append(Image.fromarray(render_page(rng, 960)[0]))
        else:
            rng = random.Random(7 if kind == "table_heavy" else 11)
            for _ in range(n):
                imgs.append(Image.fromarray(
                    render_layout_page(rng, size=760, height=1000,
                                       mix=mix[kind])[0]
                ))
        counts[kind] = n
    return pdfio.images_to_pdf(imgs, dpi=144), counts


def _transfer_split(stage_wall_ms: dict[str, float]) -> dict:
    """Join the serialized transfer estimate with measured stage walls.

    The estimate from byte counters x wire constants assumes zero
    overlap; dispatch/fetch pipelining overlaps transfer under compute,
    so the estimate can exceed wall. The split therefore CAPS transfer
    at the measured wall and reports the overlap explicitly —
    "transfer > wall" is impossible by construction here.
    """
    from rapiddoc_tpu.engine.session import transfer_split_report

    out = {}
    for name, tr in transfer_split_report().items():
        wall = stage_wall_ms.get(name)
        est = tr["transfer_ms_est"]
        if wall is None:
            out[name] = {**tr, "note": "no stage wall measured"}
            continue
        transfer = min(est, wall)
        out[name] = {
            "stage_wall_ms": round(wall, 1),
            "transfer_ms": round(transfer, 1),
            "compute_ms": round(wall - transfer, 1),
            "overlapped_ms": round(max(est - wall, 0.0), 1),
            "bytes_in": tr["bytes_in"],
            "bytes_out": tr["bytes_out"],
            "fetches": tr["fetches"],
        }
    return out


def _bench_e2e() -> tuple[float, dict, int, dict, dict]:
    """pages/sec through RapidDoc + per-stage ms/page + MFU report.

    Default: ALL stages enabled (layout + ocr + formula + table, demo
    checkpoints standing in for the published ones) over a real
    document (demo1.pdf) in ocr mode — the BASELINE.md metric
    definition. RAPIDDOC_BENCH_OCR_ONLY=1 restores the det/rec-only
    synthetic-page run (the round-1 metric, kept for trajectory
    comparison; it is also the fallback when the demo PDF is absent).
    """
    ocr_only = bool(os.environ.get("RAPIDDOC_BENCH_OCR_ONLY")) or TINY
    corpus_counts: dict = {}
    if ocr_only or not os.path.isfile(DEMO_PDF):
        os.environ.setdefault("RAPIDDOC_DISABLE_LAYOUT", "1")
        os.environ.setdefault("RAPIDDOC_DISABLE_FORMULA", "1")
        os.environ.setdefault("RAPIDDOC_DISABLE_TABLE", "1")
        pdf = _bench_pdf_bytes()
        pages = PAGES
    else:
        os.environ.setdefault("RAPIDDOC_DEMO_LAYOUT", "1")
        from rapiddoc_tpu import pdfio

        pdf, corpus_counts = _composite_corpus_pdf(PAGES)
        pages = len(pdfio.open_pdf(pdf))
        print(f"[e2e corpus] {pages} pages: {corpus_counts}", file=sys.stderr)
    from rapiddoc_tpu import RapidDoc
    from rapiddoc_tpu.api import GLOBAL_TRACER, stage_report
    from rapiddoc_tpu.engine import flops
    from rapiddoc_tpu.engine.session import session_stats_report

    doc = RapidDoc()

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

    # timed: TWO warm passes — run-to-run tunnel variance is ±20%
    # (ROADMAP), so the headline is the mean and the spread is reported
    runs: list[float] = []
    n_runs = 1 if TINY else 2
    for _ in range(n_runs):
        before_rec = {
            k: v["items"] for k, v in session_stats_report().items()
        }
        GLOBAL_TRACER.reset()
        flops.reset()
        tic = time.perf_counter()
        out = doc(pdf, parse_method="ocr")
        dt = time.perf_counter() - tic
        assert out.markdown  # produced real output
        runs.append(dt)
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
        k: v.get("total_s", 0.0) * 1000.0 / pages for k, v in rep.items()
    }
    for name, st in session_stats_report().items():
        print(
            f"[session] {name}: calls={st['calls']} "
            f"in={st['bytes_in']/1e6:.1f}MB out={st['bytes_out']/1e6:.1f}MB "
            f"compiles={st['compiles']} pad_overhead={st['pad_overhead']:.3f}",
            file=sys.stderr,
        )
    # MFU / FLOPs accounting (analytic HLO costs x measured stage walls)
    # + compute-bound projection independent of the tunnel wire
    stage_wall_s = {
        stage: rep.get(stage, {}).get("total_s", 0.0)
        for stage in set(_PROGRAM_STAGE.values())
    }
    mfu = flops.mfu_report(stage_wall_s, _PROGRAM_STAGE)
    # per-page projection: what each stage costs when the wire is gone
    for stage, d in mfu["stages"].items():
        d["compute_bound_ms_per_page"] = round(
            d["compute_bound_ms"] / pages, 2
        )
    print(f"[mfu] {json.dumps(mfu)}", file=sys.stderr)
    # transfer-vs-compute split: measured wire constants x observed byte
    # counters, CAPPED at stage wall (overlap reported, not denied)
    try:
        from rapiddoc_tpu.engine.session import measure_wire_bandwidth

        print(f"[wire] {measure_wire_bandwidth()}", file=sys.stderr)
        stage_wall_ms = {
            k: v.get("total_s", 0.0) * 1e3 for k, v in rep.items()
        }
        split = _transfer_split(stage_wall_ms)
        for name, tr in split.items():
            print(f"[split] {name}: {tr}", file=sys.stderr)
    except Exception:
        import traceback

        traceback.print_exc()
    # host-path vs device-path: the window pipeline runs render (N+1)
    # and assembly (N-1) on worker threads under device compute of
    # window N, so e2e should approach max(host, device), not their sum.
    # "ocr" wraps det+crop+rec and "assembly" feeds assembly_final —
    # parents are excluded from the sums.
    host_stages = ("render", "ocr_crop", "assembly", "assembly_final")
    dev_stages = (
        "layout", "ocr_det", "ocr_rec", "formula", "table", "orientation"
    )
    host_ms = sum(report.get(s, 0.0) for s in host_stages)
    dev_ms = sum(report.get(s, 0.0) for s in dev_stages)
    e2e_ms = dt * 1e3 / pages
    overlap = {
        "host_path_ms_per_page": round(host_ms, 1),
        "device_path_ms_per_page": round(dev_ms, 1),
        "e2e_ms_per_page": round(e2e_ms, 1),
        # 1.0 = perfect overlap (e2e == the longer path); values > 1
        # measure serialization still left in the pipeline
        "e2e_over_max_path": round(e2e_ms / max(host_ms, dev_ms, 1e-9), 3),
    }
    print(f"[overlap] {overlap}", file=sys.stderr)
    # ocr_rec throughput detail (VERDICT r3: the dominant device stage)
    rec_stats = session_stats_report().get("ocr_rec", {})
    rec_wall_s = rep.get("ocr_rec", {}).get("total_s", 0.0)
    overlap["ocr_rec_detail"] = {
        "crops": WORKLOAD["rec_crops"],
        "crops_per_sec": round(WORKLOAD["rec_crops"] / rec_wall_s, 1)
        if rec_wall_s else None,
        "ms_per_page": round(report.get("ocr_rec", 0.0), 1),
        "pad_overhead": round(rec_stats.get("pad_overhead", 0.0), 3),
        "session_calls": rec_stats.get("calls"),
    }
    # variance across the warm timed runs (tunnel jitter is the main
    # source; small-N stage conclusions need the spread on record)
    pps_runs = [round(pages / r, 3) for r in runs]
    mean_dt = sum(runs) / len(runs)
    overlap["variance"] = {
        "pages_per_sec_runs": pps_runs,
        "spread_pct": round(
            (max(pps_runs) - min(pps_runs)) / max(sum(pps_runs) /
                                                  len(pps_runs), 1e-9) * 100,
            1,
        ),
        "corpus": corpus_counts,
    }
    print(f"[variance] {overlap['variance']}", file=sys.stderr)
    # trajectory metric: the r1-r4 benches timed 12 demo1.pdf pages; keep
    # that number alongside so cross-round comparisons stay apples-to-
    # apples after the corpus grew to 56 mixed pages (VERDICT r4 next #8)
    if not ocr_only and os.path.isfile(DEMO_PDF):
        try:
            from rapiddoc_tpu.cli.common import (
                convert_pdf_bytes_to_bytes_by_pages,
            )

            raw = open(DEMO_PDF, "rb").read()
            import rapiddoc_tpu.pdfio as _pdfio

            n12 = min(12, len(_pdfio.open_pdf(raw)))
            pdf12 = convert_pdf_bytes_to_bytes_by_pages(raw, 0, n12 - 1)
            doc(pdf12, parse_method="ocr")  # warm any new buckets
            tic = time.perf_counter()
            doc(pdf12, parse_method="ocr")
            overlap["trajectory_demo1_12p_pages_per_sec"] = round(
                n12 / (time.perf_counter() - tic), 3
            )
            print(
                f"[trajectory] demo1 12p: "
                f"{overlap['trajectory_demo1_12p_pages_per_sec']} p/s",
                file=sys.stderr,
            )
        except Exception:
            import traceback

            traceback.print_exc()
    return pages / mean_dt, report, pages, mfu, overlap


def _bench_corpus() -> dict:
    """Per-doc-type pages/sec: the headline number must not hinge on one
    12-page English paper (VERDICT r3). Each doc runs in ocr mode with
    all stages enabled, timed on a second (warm) pass."""
    from rapiddoc_tpu import RapidDoc, pdfio
    from rapiddoc_tpu.cli.common import convert_pdf_bytes_to_bytes_by_pages

    os.environ.setdefault("RAPIDDOC_DEMO_LAYOUT", "1")
    n = 4
    docs: dict[str, bytes] = {}
    if os.path.isfile(CJK_PDF):
        raw = open(CJK_PDF, "rb").read()
        k = min(n, len(pdfio.open_pdf(raw)))
        docs["cjk_scan"] = convert_pdf_bytes_to_bytes_by_pages(raw, 0, k - 1)
    docs["table_heavy"] = _synth_corpus_pdf("table_heavy", n)
    docs["formula_dense"] = _synth_corpus_pdf("formula_dense", n)

    doc = RapidDoc()
    out: dict = {}
    for kind, pdf in docs.items():
        pages = len(pdfio.open_pdf(pdf))
        lang = "ch" if kind == "cjk_scan" else "en"
        doc(pdf, parse_method="ocr", lang=lang)  # warm (new buckets)
        tic = time.perf_counter()
        r = doc(pdf, parse_method="ocr", lang=lang)
        dt = time.perf_counter() - tic
        assert r.markdown is not None
        out[kind] = {
            "pages": pages,
            "pages_per_sec": round(pages / dt, 3),
        }
        print(f"[corpus] {kind}: {out[kind]}", file=sys.stderr)
    return out


def _bench_published_dims() -> dict:
    """Stage costs at PUBLISHED architecture dims (random-init where the
    converted weights are absent) — the e2e run uses demo-size layout
    and formula nets, whose speed does not predict deployment. Measured
    here on the same document images:

    - layout: RT-DETR B4 at 800^2 with the V3 mask branch (reference:
      model_handler/pp_doclayout/main.py:17-29), ms/page warm.
    - formula: PPHGNetV2-B6 encoder + 6x512 MBart decoder, vocab 50000
      (reference: pp_formulanet_arch_config.yaml:12). Random init emits
      no EOS, so the decode runs the FULL bucket. ms/step is measured by
      DIFFERENCING two buckets ((t(512)-t(256))/256), which cancels the
      encoder forward and dispatch overhead (a round-3 finding: dividing
      the whole batch_predict wall by the bucket length inflated
      ms/step). RAPIDDOC_BENCH_FORMULA_FULL=1 also times the published
      2560-token budget end-to-end.
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

    rec = FormulaRecognizer(config=FormulaConfig())  # B6, 6x512, 50k vocab
    crops = []
    for i in range(4):
        crop = np.full((64 + 16 * i, 320 + 64 * i, 3), 255, np.uint8)
        cv2.putText(crop, "E=mc2", (10, 40), cv2.FONT_HERSHEY_SIMPLEX,
                    1.0, (0, 0, 0), 2)
        crops.append(crop)

    def _timed_bucket(bucket: int) -> float:
        rec.batch_predict(crops, length_bucket=bucket)  # warm (compile)
        tic = time.perf_counter()
        rec.batch_predict(crops, length_bucket=bucket)
        return time.perf_counter() - tic

    t256 = _timed_bucket(256)
    t512 = _timed_bucket(512)
    out["formula_ms_per_region"] = round(t256 * 1e3 / len(crops), 1)
    # decode-only per step: differencing cancels encoder + dispatch
    out["formula_decode_ms_per_step"] = round(
        max(t512 - t256, 0.0) * 1e3 / 256, 3
    )
    out["formula_len_bucket"] = 256
    if os.environ.get("RAPIDDOC_BENCH_FORMULA_FULL"):
        t2560 = _timed_bucket(2560)
        full = {
            "formula_ms_per_region_2560": round(t2560 * 1e3 / len(crops), 1),
            "formula_decode_ms_per_step_2560": round(
                max(t2560 - t256, 0.0) * 1e3 / (2560 - 256), 3
            ),
        }
        out.update(full)
        # persist so a plain (driver) bench run still carries the
        # published-budget figure without re-paying the ~2560-step decode
        with open("FORMULA_FULL.json", "w") as f:
            json.dump(full, f, indent=1)
    elif os.path.isfile("FORMULA_FULL.json"):
        with open("FORMULA_FULL.json") as f:
            out.update(json.load(f))
        out["formula_2560_note"] = "recorded by a prior FORMULA_FULL run"
    return out


def _bench_ctc_head() -> dict:
    """Pallas fused CTC head vs plain XLA at the 18710-class dict.

    The fused kernel (ops/ctc_head.py) streams vocab tiles through VMEM
    so the (B*T, 18710) logits never hit HBM; the XLA path materializes
    them (dense -> softmax -> argmax). Same shapes the rec engine uses:
    B=128 crops x T=40 frames x C=120 features (48x320 bucket)."""
    import jax
    import jax.numpy as jnp

    from rapiddoc_tpu.ops.ctc_head import fused_ctc_argmax

    B, T, C, V = 128, 40, 120, 18710
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (B * T, C), jnp.bfloat16)
    kernel = jax.random.normal(key, (C, V), jnp.bfloat16)
    bias = jnp.zeros((V,), jnp.float32)

    @jax.jit
    def xla_head(x, w, b):
        logits = (x.astype(jnp.float32) @ w.astype(jnp.float32)) + b
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1)

    interpret = jax.default_backend() != "tpu"

    def timed(fn, *a):
        jax.block_until_ready(fn(*a))  # warm/compile
        reps = 20
        # enqueue all reps, then block ONCE: per-call host<->device
        # latency (tens of ms through a tunneled chip) amortizes away,
        # leaving device execution time — the thing being compared
        tic = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - tic) * 1e3 / reps

    t_xla = timed(xla_head, feats, kernel, bias)
    t_pallas = timed(
        lambda x, w, b: fused_ctc_argmax(x, w, b, interpret=interpret),
        feats, kernel, bias,
    )
    # HBM the XLA path writes+reads for the logits tensor alone
    logits_mb = B * T * V * 4 / 1e6
    return {
        "shape": f"({B * T}, {C}) x ({C}, {V})",
        "xla_ms": round(t_xla, 2),
        "pallas_ms": round(t_pallas, 2),
        "speedup": round(t_xla / max(t_pallas, 1e-9), 2),
        "logits_hbm_mb_avoided": round(logits_mb, 1),
        **({"interpret_mode": True} if interpret else {}),
    }


def _bench_quant_head() -> dict:
    """Int8-weight fused lm_head vs XLA bf16 at the published formula
    decoder head shape (B=16 decode slots, 512 x 50000). The decode step
    is weight-bound: int8 halves the HBM bytes the head streams per
    step (ops/quant_head.py)."""
    import jax
    import jax.numpy as jnp

    from rapiddoc_tpu.ops.quant_head import (
        fused_argmax_int8,
        quantize_weight_int8,
    )

    B, K, V = 16, 512, 50000
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, V), jnp.float32) * 0.05
    b = jnp.zeros((V,), jnp.float32)
    wq, s = quantize_weight_int8(w)
    wbf = w.astype(jnp.bfloat16)

    @jax.jit
    def xla_head(x, w, b):
        logits = (
            x.astype(jnp.float32) @ w.astype(jnp.float32)
        ) + b
        return jnp.argmax(logits, axis=-1)

    interpret = jax.default_backend() != "tpu"

    def timed(fn, *a):
        jax.block_until_ready(fn(*a))
        reps = 20
        tic = time.perf_counter()
        outs = [fn(*a) for _ in range(reps)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - tic) * 1e3 / reps

    t_xla = timed(xla_head, x, wbf, b)
    t_int8 = timed(
        lambda x, wq, s, b: fused_argmax_int8(
            x, wq, s, b, interpret=interpret
        ),
        x, wq, s, b,
    )
    ids_a = np.asarray(xla_head(x, wbf, b))
    ids_b = np.asarray(
        fused_argmax_int8(x, wq, s, b, interpret=interpret)[0]
    )
    return {
        "shape": f"({B}, {K}) x ({K}, {V})",
        "xla_bf16_ms": round(t_xla, 3),
        "int8_fused_ms": round(t_int8, 3),
        "speedup": round(t_xla / max(t_int8, 1e-9), 2),
        "weight_mb_bf16": round(K * V * 2 / 1e6, 1),
        "weight_mb_int8": round(K * V * 1 / 1e6, 1),
        "argmax_agreement": round(float((ids_a == ids_b).mean()), 4),
        **({"interpret_mode": True} if interpret else {}),
    }


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


def _bench_xla_cpu_reference() -> float | None:
    """ORT-CPU-proxy pages/sec over the same measured workload: the
    reference graphs compiled by XLA-CPU (fp32), per-unit costs persisted
    in BASELINE_CPU_XLA.json by tools/measure_baseline_xla_cpu (a fusing
    graph compiler, the honest stand-in for onnxruntime-CPU which cannot
    be installed here). Read-only at bench time — measurement is a
    separate ~30-min offline step."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU_XLA.json"
    )
    if not os.path.isfile(path):
        return None
    costs = json.load(open(path))["unit_costs_ms"]
    wl = WORKLOAD or {}
    pages = PAGES
    crops = int(wl.get("rec_crops") or pages * 24)
    n_formula = int(wl.get("formula_regions") or 0)
    n_table = int(wl.get("table_regions") or 0)
    total = (
        pages * costs.get("det_ms_per_page", 0.0)
        + crops * costs.get("rec_ms_per_crop", 0.0)
        + pages * costs.get("layout_ms_per_page", 0.0)
        + n_formula * (
            costs.get("formula_enc_ms_per_region", 0.0)
            + FORMULA_STEPS_PER_SEQ * costs.get("formula_step_ms", 0.0)
        )
        + n_table * costs.get("table_unet_ms_per_region", 0.0)
    ) / 1e3
    if total <= 0:
        return None
    print(
        f"[baseline-xla-cpu] total={total:.1f}s for {pages}p/{crops}c/"
        f"{n_formula}f/{n_table}t (unit costs from BASELINE_CPU_XLA.json)",
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
    pps, stages, pages, mfu, overlap = _bench_e2e()
    corpus = None
    if (
        not TINY
        and not tpu_down
        and not os.environ.get("RAPIDDOC_BENCH_SKIP_CORPUS")
    ):
        try:
            corpus = _bench_corpus()
        except Exception:
            import traceback

            traceback.print_exc()
    cold_start = None
    if os.environ.get("RAPIDDOC_BENCH_COLDSTART") and not tpu_down:
        # dress rehearsal: fresh-process first-compile budget, with and
        # without the persistent XLA cache (slow — three subprocesses)
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
            from coldstart import rehearse

            cold_start = rehearse()
            with open("COLDSTART.json", "w") as f:
                json.dump(cold_start, f, indent=1)
        except Exception:
            import traceback

            traceback.print_exc()
    elif os.path.isfile("COLDSTART.json"):
        # a previously recorded rehearsal stays in the bench record
        with open("COLDSTART.json") as f:
            cold_start = json.load(f)
    ctc_head = None
    quant_head = None
    if not TINY and not tpu_down:
        try:
            ctc_head = _bench_ctc_head()
            print(f"[ctc_head] {ctc_head}", file=sys.stderr)
        except Exception:
            import traceback

            traceback.print_exc()
        try:
            quant_head = _bench_quant_head()
            print(f"[quant_head] {quant_head}", file=sys.stderr)
        except Exception:
            import traceback

            traceback.print_exc()
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
    xla_base_pps = None
    try:
        xla_base_pps = _bench_xla_cpu_reference()
    except Exception:
        import traceback

        traceback.print_exc()
    vs_xla = round(pps / xla_base_pps, 3) if xla_base_pps else None
    import jax

    print(
        json.dumps(
            {
                "metric": "e2e_ocr_pages_per_sec",
                "value": round(pps, 3),
                "unit": "pages/sec/chip",
                "vs_baseline": vs,
                # the denominator is torch-eager on ONE CPU core of this
                # host (BASELINE_CPU.json meta), NOT the BASELINE.md
                # "onnxruntime-CPU on v5e-8" gate — onnxruntime is not
                # installable here (zero egress). Kept in-band so the
                # ratio cannot be misread as that gate.
                "baseline_kind": "torch-eager-cpu1",
                "baseline_caveat": (
                    "denominator = reference torch nets, eager, on this "
                    "host's single CPU core; NOT onnxruntime-CPU (not "
                    "installable here). Methodology: BOTH local CPU "
                    "denominators were measured — torch-eager (oneDNN) "
                    "and XLA-CPU-jit (BASELINE_CPU_XLA.json); torch-"
                    "eager is the FASTER of the two on every stage, so "
                    "it is the conservative primary. ORT-CPU shares the "
                    "oneDNN/MLAS kernel class with torch-eager and is "
                    "expected within ~2x of it."
                ),
                # second denominator: the same graphs through XLA-CPU
                # (fusing graph compiler, fp32) — the honest ORT-CPU
                # proxy this environment allows
                **(
                    {
                        "vs_baseline_xla_cpu": vs_xla,
                        "baseline_xla_cpu_kind": "xla-cpu-jit-fp32-cpu1",
                    }
                    if vs_xla
                    else {}
                ),
                "stage_ms_per_page": {
                    k: round(v, 1) for k, v in (stages or {}).items()
                },
                "pages": pages,
                "mfu": mfu,
                "overlap": overlap,
                **({"corpus": corpus} if corpus else {}),
                **({"cold_start": cold_start} if cold_start else {}),
                **({"ctc_head": ctc_head} if ctc_head else {}),
                **({"quant_head": quant_head} if quant_head else {}),
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
