"""Cold-start dress rehearsal: first-compile budget with and without the
persistent XLA compile cache (VERDICT r3 #9).

Runs the SAME workload in three fresh subprocesses:

1. ``nocache``  — no persistent cache: every bucket compiles from scratch.
2. ``cold``     — RAPIDDOC_XLA_CACHE_DIR points at an EMPTY directory:
                  compiles from scratch AND populates the cache.
3. ``warm``     — same cache dir again: compiles should be cache hits.

The workload is a 2-page ocr-mode parse through the production RapidDoc
facade (demo checkpoints), so the compiled set is the real pipeline's
bucket set at demo dims — layout, DBNet det, SVTR rec, formula AR,
table. Published-dims first-compile is larger (the 960^2 det bucket ran
6-10 min under the tunneled link, ROADMAP.md); this rehearsal documents
the per-process budget and how much of it the persistent cache removes
on the actual backend (axon tunnels were measured NOT to honor it —
that result belongs in the record, which is the point of a rehearsal).

Usage:  python tools/coldstart.py [out.json]
        (also invoked by bench.py under RAPIDDOC_BENCH_COLDSTART=1)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_CHILD = r"""
import json, os, sys, time
t0 = time.perf_counter()
import numpy as np
from rapiddoc_tpu import RapidDoc, pdfio
from PIL import Image, ImageDraw
imgs = []
for i in range(2):
    im = Image.new("RGB", (760, 1000), "white")
    d = ImageDraw.Draw(im)
    for row in range(12):
        d.text((60, 60 + row * 70), f"cold start rehearsal line {row}",
               fill="black")
    imgs.append(im)
pdf = pdfio.images_to_pdf(imgs, dpi=144)
t_import = time.perf_counter() - t0
t1 = time.perf_counter()
doc = RapidDoc()
r = doc(pdf, parse_method="ocr")
assert r.markdown is not None
t_first = time.perf_counter() - t1
from rapiddoc_tpu.engine.session import session_stats_report
compiles = {k: v["compiles"] for k, v in session_stats_report().items()}
print("CHILD:" + json.dumps({
    "import_s": round(t_import, 2),
    "first_parse_s": round(t_first, 2),
    "compiles": compiles,
}))
"""


def _run_child(cache_dir: str | None) -> dict:
    env = dict(os.environ)
    # the cache defaults ON since round 5, so the no-cache leg must
    # disable it explicitly
    env["RAPIDDOC_XLA_CACHE_DIR"] = cache_dir if cache_dir else "off"
    env.setdefault("RAPIDDOC_DEMO_LAYOUT", "1")
    tic = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    wall = time.perf_counter() - tic
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD:"):
            out = json.loads(line[len("CHILD:"):])
            out["process_wall_s"] = round(wall, 2)
            return out
    raise RuntimeError(
        f"cold-start child failed (rc={proc.returncode}):\n"
        f"{proc.stderr[-2000:]}"
    )


def rehearse() -> dict:
    with tempfile.TemporaryDirectory(prefix="xla_cache_") as cache:
        nocache = _run_child(None)
        cold = _run_child(cache)
        entries = sum(len(files) for _, _, files in os.walk(cache))
        warm = _run_child(cache)
    saved = cold["first_parse_s"] - warm["first_parse_s"]
    return {
        "workload": "RapidDoc() + 2-page ocr parse, demo dims",
        "nocache": nocache,
        "cold": cold,
        "warm": warm,
        "cache_entries_written": entries,
        "warm_saves_s": round(saved, 2),
        "cache_effective": bool(entries and saved > 1.0),
        "note": (
            "published-dims first-compile is larger (960^2 det bucket "
            "~6-10 min over the tunneled link); 'cache_effective' False "
            "means this backend does not honor the persistent cache "
            "and real deployments must budget the 'nocache' wall"
        ),
    }


if __name__ == "__main__":
    report = rehearse()
    out = sys.argv[1] if len(sys.argv) > 1 else "COLDSTART.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
