"""Benchmark: OCR device-path throughput on the current JAX backend.

Measures the end-to-end hot path (det forward over page-size buckets +
rec forward over text-line crops) in pages/sec on one chip, and compares
against the reference's engine implementation (its torch network zoo run
on CPU — the closest runnable stand-in for the onnxruntime-CPU reference
in this environment; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PAGES = int(os.environ.get("RAPIDDOC_BENCH_PAGES", "16"))
CROPS_PER_PAGE = int(os.environ.get("RAPIDDOC_BENCH_CROPS", "24"))
DET_HW = (960, 704)
REC_HW = (48, 320)


def _bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from rapiddoc_tpu.models.ocr.det import DBNet
    from rapiddoc_tpu.models.ocr.rec import SVTRRec, ctc_greedy_decode

    det = DBNet()
    rec = SVTRRec(num_classes=18710)
    rng = np.random.default_rng(0)
    det_batch = rng.standard_normal((PAGES, *DET_HW, 3), dtype=np.float32)
    rec_batch = rng.standard_normal(
        (PAGES * CROPS_PER_PAGE, *REC_HW, 3), dtype=np.float32
    )
    det_vars = det.init(jax.random.PRNGKey(0), det_batch[:1])
    rec_vars = rec.init(jax.random.PRNGKey(1), rec_batch[:1])

    @jax.jit
    def det_fwd(v, x):
        return det.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def rec_fwd(v, x):
        return ctc_greedy_decode(rec.apply(v, x.astype(jnp.bfloat16)))

    det_bs = min(8, PAGES)
    rec_bs = min(64, len(rec_batch))

    def run_once():
        outs = []
        for i in range(0, PAGES, det_bs):
            outs.append(det_fwd(det_vars, jnp.asarray(det_batch[i : i + det_bs])))
        for i in range(0, len(rec_batch), rec_bs):
            outs.append(rec_fwd(rec_vars, jnp.asarray(rec_batch[i : i + rec_bs])))
        jax.block_until_ready(outs)

    run_once()  # compile
    tic = time.perf_counter()
    run_once()
    dt = time.perf_counter() - tic
    return PAGES / dt


def _bench_torch_reference() -> float | None:
    """Reference torch nets (same architectures) on CPU as the baseline."""
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
    # measure a reduced workload and extrapolate (CPU is slow)
    pages = max(2, PAGES // 8)
    crops = pages * CROPS_PER_PAGE
    rng = np.random.default_rng(0)
    det_x = torch.from_numpy(
        rng.standard_normal((pages, 3, *DET_HW), dtype=np.float32)
    )
    rec_x = torch.from_numpy(
        rng.standard_normal((crops, 3, *REC_HW), dtype=np.float32)
    )
    with torch.no_grad():
        det(det_x[:1])  # warm
        tic = time.perf_counter()
        for i in range(0, pages, 4):
            det(det_x[i : i + 4])
        for i in range(0, crops, 32):
            rec(rec_x[i : i + 32])
        dt = time.perf_counter() - tic
    return pages / dt


def main() -> None:
    jax_pps = _bench_jax()
    base_pps = None
    if not os.environ.get("RAPIDDOC_BENCH_SKIP_BASELINE"):
        try:
            base_pps = _bench_torch_reference()
        except Exception:
            base_pps = None
    vs = round(jax_pps / base_pps, 3) if base_pps else None
    print(
        json.dumps(
            {
                "metric": "ocr_device_path_throughput",
                "value": round(jax_pps, 3),
                "unit": "pages/sec/chip",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
