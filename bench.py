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

TINY = bool(os.environ.get("RAPIDDOC_BENCH_TINY"))
PAGES = int(os.environ.get("RAPIDDOC_BENCH_PAGES", "2" if TINY else "16"))
CROPS_PER_PAGE = int(os.environ.get("RAPIDDOC_BENCH_CROPS", "4" if TINY else "24"))
DET_HW = (192, 192) if TINY else (960, 704)
REC_HW = (48, 80) if TINY else (48, 320)


def _bench_jax() -> float:
    """Realistic device path: uint8 page/crop batches cross host->device,
    normalization + forward run fused on device, all batches dispatched
    before any result is fetched (the JaxSession dispatch/fetch split —
    transfers pipeline under compute; the host<->device roundtrip, tens
    of ms through a tunneled chip, is paid once, not once per batch)."""
    import jax
    import jax.numpy as jnp

    from rapiddoc_tpu.models.ocr.det import DBNet
    from rapiddoc_tpu.models.ocr.rec import SVTRRec
    from rapiddoc_tpu.models.ocr.pre_post import (
        det_normalize_device,
        rec_normalize_device,
    )

    det = DBNet()
    rec = SVTRRec(num_classes=18710)
    rng = np.random.default_rng(0)
    det_batch = rng.integers(0, 255, (PAGES, *DET_HW, 3), dtype=np.uint8)
    rec_batch = rng.integers(
        0, 255, (PAGES * CROPS_PER_PAGE, *REC_HW, 3), dtype=np.uint8
    )
    det_vars = det.init(
        jax.random.PRNGKey(0), np.zeros((1, *DET_HW, 3), np.float32)
    )
    rec_vars = rec.init(
        jax.random.PRNGKey(1), np.zeros((1, *REC_HW, 3), np.float32)
    )

    @jax.jit
    def det_fwd(v, x):
        # packed readback, matching TextDetector's det_apply: full-res
        # threshold bitmap packed to bits + 2x uint8 prob for box scoring
        x = det_normalize_device(x).astype(jnp.bfloat16)
        prob = det.apply(v, x).astype(jnp.float32)
        prob = jnp.clip(prob[..., 0], 0.0, 1.0)
        b, h, w = prob.shape
        bits = (prob > 0.3).astype(jnp.uint8).reshape(b, h, w // 8, 8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
        packed = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)
        prob8 = jnp.round(
            prob.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4)) * 255.0
        ).astype(jnp.uint8)
        return {"bits": packed, "prob8": prob8}

    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def rec_fwd(v, x):
        # production path on TPU: pallas fused head (ops/ctc_head.py) —
        # the (B,T,18710) logits never materialize in HBM. Off-TPU the
        # interpreter-mode kernel is too slow to benchmark; use the
        # plain head there.
        x = rec_normalize_device(x).astype(jnp.bfloat16)
        if on_tpu:
            from rapiddoc_tpu.ops.ctc_head import ctc_head_decode

            seq = rec.apply(v, x, features_only=True)
            head = v["params"]["head"]
            return ctc_head_decode(seq, head["kernel"], head["bias"])
        from rapiddoc_tpu.models.ocr.rec import ctc_greedy_decode

        return ctc_greedy_decode(rec.apply(v, x))

    det_bs = min(8, PAGES)
    rec_bs = min(64, len(rec_batch))

    def run_once():
        # phase 1: enqueue everything (transfer/compute pipeline on device)
        det_handles = [
            det_fwd(det_vars, jnp.asarray(det_batch[i : i + det_bs]))
            for i in range(0, PAGES, det_bs)
        ]
        rec_handles = [
            rec_fwd(rec_vars, jnp.asarray(rec_batch[i : i + rec_bs]))
            for i in range(0, len(rec_batch), rec_bs)
        ]
        # phase 2: concatenate on device, fetch once per stage — the
        # host<->device roundtrip is paid twice total, not per batch
        # (mirrors JaxSession.run_batched)
        det_out = {
            k: np.asarray(jnp.concatenate([h[k] for h in det_handles]))
            for k in det_handles[0]
        }
        rec_out = [
            np.asarray(jnp.concatenate([h[j] for h in rec_handles]))
            for j in range(len(rec_handles[0]))
        ]
        return det_out, rec_out

    run_once()  # compile
    # best-of-3: the tunneled chip is shared, single runs are noisy
    best = float("inf")
    for _ in range(3):
        tic = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - tic)
    return PAGES / best


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
