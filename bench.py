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
    rec_hw = (48, 80) if TINY else (48, 480)
    # real measured workload of the benched document (falls back to a
    # text-page nominal when the e2e pass didn't fill it)
    wl = WORKLOAD or {}
    pages = PAGES
    crops = int(wl.get("rec_crops") or pages * 24)
    n_formula = int(wl.get("formula_regions") or 0)
    n_table = int(wl.get("table_regions") or 0)
    rng = np.random.default_rng(0)

    # --- det+rec: time small samples, extrapolate to real counts
    det_x = torch.from_numpy(
        rng.standard_normal((2, 3, *det_hw), dtype=np.float32)
    )
    rec_x = torch.from_numpy(
        rng.standard_normal((32, 3, *rec_hw), dtype=np.float32)
    )
    with torch.no_grad():
        det(det_x[:1])  # warm
        tic = time.perf_counter()
        det(det_x)
        det_s = (time.perf_counter() - tic) / 2 * pages
        rec(rec_x[:8])  # warm
        tic = time.perf_counter()
        rec(rec_x)
        rec_s = (time.perf_counter() - tic) / 32 * crops
    total = det_s + rec_s

    # --- formula: reference PP-FormulaNet_plus head (8 layers, d=1024,
    # ffn=4096) cached greedy decode + B6-class encoder forward, sampled
    # per step/crop and extrapolated to the measured region count
    if n_formula and not TINY:
        total += _torch_formula_cost(n_formula)
    # --- table: reference default UNET wired path — a 1024x1024 UNet
    # forward per table region
    if n_table and not TINY:
        total += _torch_table_cost(n_table)
    print(
        f"[baseline] det={det_s:.1f}s rec={rec_s:.1f}s "
        f"total={total:.1f}s for {pages}p/{crops}c/"
        f"{n_formula}f/{n_table}t (layout excluded: no torch reference "
        f"implementation — denominator is generous)",
        file=sys.stderr,
    )
    return pages / total


def _torch_formula_cost(n_regions: int, steps_per_seq: int = 96) -> float:
    """CPU cost model for the reference formula stage: PPFormulaNet_Head
    cached greedy decode (reference rec_ppformulanet_head.py:695: 8
    decoder layers, hidden 1024, ffn 4096, vocab ~50k) plus a
    B6-backbone encoder forward per region. Measures a few steps and one
    encoder forward, extrapolates to n_regions x steps_per_seq (96 is
    conservative; published max_new_tokens is 1536)."""
    import refnets
    import torch

    try:
        heads = refnets.load_formula("heads.rec_ppformulanet_head")
        torch.manual_seed(0)
        hd = heads.PPFormulaNet_Head(
            max_new_tokens=32, decoder_layers=8, decoder_ffn_dim=4096,
            decoder_hidden_size=1024, encoder_hidden_size=1024,
            in_channels=1024,
        ).eval()
        bb = refnets.load_formula("backbones.rec_pphgnetv2")
        enc = bb.PPHGNetV2_B6_Formula(class_num=1024).eval()
    except Exception:
        return 0.0
    S = 24 * 24  # ~384x384 crop at stride 16
    with torch.no_grad():
        x = torch.randn(1, 3, 384, 384)
        tic = time.perf_counter()
        memory = enc(x).last_hidden_state
        enc_s = time.perf_counter() - tic
        memory = torch.randn(1, S, 1024)
        projected = hd.enc_to_dec_proj(memory)
        past = None
        tok = torch.zeros((1, 1), dtype=torch.int64)
        n_steps = 4
        tic = time.perf_counter()
        for t in range(n_steps):
            out = hd.decoder(
                input_ids=tok,
                attention_mask=torch.ones((1, t + 1), dtype=torch.int64),
                encoder_hidden_states=projected,
                past_key_values=past,
                use_cache=True,
                return_dict=True,
            )
            past = out.past_key_values
            tok = out.logits[:, -1:].argmax(-1)
        step_s = (time.perf_counter() - tic) / n_steps
    return n_regions * (enc_s + step_s * steps_per_seq)


def _torch_table_cost(n_regions: int) -> float:
    """CPU cost model for the reference wired-table stage: one
    1024x1024 UNet forward per table region (reference
    table_structure/unet/main.py fixed-1024 input). Architecture matches
    the repo's UNet spec (base 16, depth 4)."""
    import torch

    class DC(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.net = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 3, padding=1),
                torch.nn.BatchNorm2d(cout), torch.nn.ReLU(),
                torch.nn.Conv2d(cout, cout, 3, padding=1),
                torch.nn.BatchNorm2d(cout), torch.nn.ReLU(),
            )

        def forward(self, x):
            return self.net(x)

    class UNet(torch.nn.Module):
        def __init__(self, base=16, depth=4):
            super().__init__()
            self.downs = torch.nn.ModuleList()
            f, cin = base, 3
            for _ in range(depth):
                self.downs.append(DC(cin, f))
                cin, f = f, f * 2
            self.bottom = DC(cin, f)
            self.ups = torch.nn.ModuleList()
            self.upc = torch.nn.ModuleList()
            for _ in range(depth):
                f //= 2
                self.upc.append(torch.nn.Conv2d(f * 2, f, 2, padding="same"))
                self.ups.append(DC(f * 2, f))
            self.head = torch.nn.Conv2d(base, 2, 1)

        def forward(self, x):
            skips = []
            for d in self.downs:
                x = d(x)
                skips.append(x)
                x = torch.nn.functional.max_pool2d(x, 2)
            x = self.bottom(x)
            for up, upc, skip in zip(self.ups, self.upc, reversed(skips)):
                x = torch.nn.functional.interpolate(x, scale_factor=2)
                x = upc(x)
                x = up(torch.cat([skip, x], dim=1))
            return self.head(x)

    net = UNet().eval()
    with torch.no_grad():
        x = torch.randn(1, 3, 1024, 1024)
        net(x)  # warm
        tic = time.perf_counter()
        net(x)
        one = time.perf_counter() - tic
    return n_regions * one


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
    base_pps = None
    if not os.environ.get("RAPIDDOC_BENCH_SKIP_BASELINE"):
        try:
            base_pps = _bench_torch_reference()
        except Exception:
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
