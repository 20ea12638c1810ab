"""Measure an ORT-CPU-*proxy* denominator → BASELINE_CPU_XLA.json.

BASELINE.md's speed gate divides by "onnxruntime-CPU", which cannot be
installed here (zero egress). BASELINE_CPU.json (the torch-eager
denominator) understates a graph-compiled runtime: ORT fuses and
pre-packs, eager torch does not. This tool produces the closest honest
stand-in this environment allows: the SAME reference network graphs
(op-for-op parity pinned by tests/test_fullstack_parity.py) compiled by
a graph-optimizing CPU backend — XLA-CPU — in fp32 at published dims,
measured per unit in time-boxed subprocesses.

Methodology caveats, recorded in the output:
- MEASURED FINDING (2026-08-20): on this 1-core host XLA-CPU came out
  1.2-6.5x SLOWER than torch-eager for every conv-dominated stage —
  torch's oneDNN prepacked convs beat XLA-CPU's codegen at batch 1.
  The torch-eager BASELINE_CPU.json is therefore the FASTER and thus
  conservative primary denominator; this file is the cross-check.
- ORT-CPU shares the oneDNN/MLAS kernel class with torch-eager, so the
  torch number is the honest local ORT proxy (graph-level fusions put
  ORT within ~2x of it).
- this host exposes ONE CPU core; ORT numbers on a many-core server
  scale with intra-op threads, so ratios here model a per-core budget.

Usage:
  python -m rapiddoc_tpu.tools.measure_baseline_xla_cpu            # all
  python -m rapiddoc_tpu.tools.measure_baseline_xla_cpu --stage det
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
OUT = REPO / "BASELINE_CPU_XLA.json"

TIMEBOX = {"det": 600, "rec": 420, "formula": 900, "table": 600,
           "layout": 900}


def _force_cpu() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")


def _timed(fn, *args, reps: int = 3) -> float:
    """Seconds per call, warm (min over reps)."""
    import jax

    jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        tic = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - tic)
    return best


def measure_det() -> dict:
    """DBNet det forward at 960² fp32 → ms/page (ref arch: PP-OCRv6-small,
    arch_config.yaml:1-20)."""
    _force_cpu()
    import jax
    import numpy as np

    from rapiddoc_tpu.models.ocr.det import DBNet

    m = DBNet()
    x = np.zeros((1, 960, 960, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x[:, :64, :64])
    fn = jax.jit(lambda v, x: m.apply(v, x))
    return {"det_ms_per_page": round(_timed(fn, v, x) * 1e3, 1)}


def measure_rec() -> dict:
    """SVTR/CTC rec at 48x480 fp32, batch 8 → ms/crop (ref
    arch_config.yaml:22-40)."""
    _force_cpu()
    import jax
    import numpy as np

    from rapiddoc_tpu.models.ocr.rec import SVTRRec

    m = SVTRRec(num_classes=18711)
    x = np.zeros((8, 48, 480, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1, :, :80])
    fn = jax.jit(lambda v, x: m.apply(v, x))
    return {"rec_ms_per_crop": round(_timed(fn, v, x) * 1e3 / 8, 2)}


def measure_formula() -> dict:
    """PPHGNetV2-B6 encoder at 384² + MBart(6x512, 50k) cached decode →
    ms/region (encode) + ms/step (ref pp_formulanet_arch_config.yaml)."""
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rapiddoc_tpu.models.formula.decoder import greedy_decode
    from rapiddoc_tpu.models.formula.model import build_formula_modules

    enc, decoder, mem_proj, cfg = build_formula_modules()
    rng = jax.random.PRNGKey(0)
    enc_vars = enc.init(rng, np.zeros((1, 96, 96, 1), np.float32))
    x = np.zeros((1, 384, 384, 1), np.float32)
    t_enc = _timed(jax.jit(lambda v, x: enc.apply(v, x)), enc_vars, x,
                   reps=2)
    S = 144
    hd = cfg.d_model // cfg.heads
    rng = jax.random.PRNGKey(1)
    dec_vars = decoder.init(
        rng, np.zeros((1, 1), np.int32),
        np.zeros((cfg.layers, 1, 32, cfg.heads, hd), np.float32),
        np.zeros((cfg.layers, 1, 32, cfg.heads, hd), np.float32),
        0,
        np.zeros((cfg.layers, 1, S, cfg.heads, hd), np.float32),
        np.zeros((cfg.layers, 1, S, cfg.heads, hd), np.float32),
        np.ones((1, S), bool),
    )
    mem_vars = mem_proj.init(rng, np.zeros((1, S, cfg.d_model), np.float32))
    memory = np.zeros((1, S, cfg.d_model), np.float32)
    mask = np.ones((1, S), bool)

    def dec(n):
        f = jax.jit(
            lambda dv, mv, mem: greedy_decode(
                decoder, dv, mem_proj, mv, mem, jnp.asarray(mask), n,
                dtype=jnp.float32,
            )
        )
        return _timed(f, dec_vars, mem_vars, memory, reps=2)

    t32, t64 = dec(32), dec(64)
    return {
        "formula_enc_ms_per_region": round(t_enc * 1e3, 1),
        "formula_step_ms": round(max(t64 - t32, 0.0) * 1e3 / 32, 2),
    }


def measure_table() -> dict:
    """UNET wired table at 1024² fp32 → ms/region (ref
    table_structure/unet/main.py fixed-1024 input)."""
    _force_cpu()
    import jax
    import numpy as np

    from rapiddoc_tpu.models.table.unet import UNet

    m = UNet()
    x = np.zeros((1, 1024, 1024, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x[:, :128, :128])
    fn = jax.jit(lambda v, x: m.apply(v, x))
    return {"table_unet_ms_per_region": round(_timed(fn, v, x, reps=2) * 1e3, 1)}


def measure_layout() -> dict:
    """RT-DETR (B4-class backbone, mask branch) at 800² fp32 → ms/page
    (ref model_handler/pp_doclayout/main.py:17-29)."""
    _force_cpu()
    import jax
    import numpy as np

    from rapiddoc_tpu.models.layout.rtdetr import RTDETR

    m = RTDETR(num_classes=25, backbone_size="B4", with_masks=True)
    x = np.zeros((1, 800, 800, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32))
    fn = jax.jit(lambda v, x: m.apply(v, x))
    return {"layout_ms_per_page": round(_timed(fn, v, x, reps=2) * 1e3, 1)}


STAGES = {
    "det": measure_det,
    "rec": measure_rec,
    "formula": measure_formula,
    "table": measure_table,
    "layout": measure_layout,
}


def run_all() -> dict:
    """Each stage in its own time-boxed subprocess; failures keep the
    prior persisted value for that stage."""
    prior = {}
    if OUT.is_file():
        try:
            prior = json.load(open(OUT)).get("unit_costs_ms", {})
        except Exception:
            prior = {}
    costs: dict = dict(prior)
    for stage in STAGES:
        try:
            r = subprocess.run(
                [sys.executable, "-m",
                 "rapiddoc_tpu.tools.measure_baseline_xla_cpu",
                 "--stage", stage],
                timeout=TIMEBOX[stage], capture_output=True, text=True,
                cwd=str(REPO),
                env={**os.environ, "JAX_PLATFORMS": "cpu"},
            )
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            got = json.loads(line)
            costs.update(got)
            print(f"[xla-cpu baseline] {stage}: {got}", file=sys.stderr)
        except Exception:
            traceback.print_exc()
            print(
                f"[xla-cpu baseline] {stage} failed; keeping prior value",
                file=sys.stderr,
            )
    out = {
        "unit_costs_ms": costs,
        "meta": {
            "runtime": "jax XLA-CPU jit, fp32",
            "host_cores": os.cpu_count(),
            "role": (
                "ORT-CPU proxy: same reference graphs (parity-pinned) "
                "through a fusing/pre-packing CPU graph compiler; "
                "onnxruntime itself is not installable here"
            ),
        },
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGES))
    args = ap.parse_args()
    if args.stage:
        print(json.dumps(STAGES[args.stage]()))
    else:
        run_all()


if __name__ == "__main__":
    main()
