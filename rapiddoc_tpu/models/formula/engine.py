"""Formula recognition engine: crops -> LaTeX.

Pipeline parity with the reference formula stack (reference:
rapid_doc/model/formula/rapid_formula_self/model_handler/pp_formulanet_plus/
pre_process.py:12-257 — crop margin, UniMERNet normalize mean .7931 /
std .1738, grayscale->3ch, pad to /16 shape buckets; post_process.py —
tokenizer decode + LaTeX fixups). The AR decode runs as a compiled
lax.while_loop per (image-bucket, length-bucket) pair.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ...config import get_models_dir
from ...utils.logging import get_logger
from .decoder import greedy_decode
from .model import build_formula_modules

logger = get_logger("rapiddoc_tpu.formula")

UNIMER_MEAN = 0.7931
UNIMER_STD = 0.1738

# (H, W) buckets — all /32-divisible
IMAGE_BUCKETS = [(96, 384), (128, 512), (192, 768), (192, 1024)]
LENGTH_BUCKETS = (256, 512, 1024, 2560)


def crop_margin(img: np.ndarray, pad: int = 8) -> np.ndarray:
    """Trim uniform white margins around the formula."""
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
    mask = gray < 250
    if not mask.any():
        return img
    ys, xs = np.where(mask)
    y0, y1 = max(ys.min() - pad, 0), min(ys.max() + pad + 1, img.shape[0])
    x0, x1 = max(xs.min() - pad, 0), min(xs.max() + pad + 1, img.shape[1])
    return img[y0:y1, x0:x1]


def preprocess_formula(img: np.ndarray) -> tuple[np.ndarray, tuple[int, int]]:
    """uint8 RGB -> uint8 luminance bucket canvas; returns (array
    (bh, bw, 1), bucket_hw). The reference preprocess grayscales then
    replicates to 3 channels (pre_process.py UniMERNet norm), so a
    1-channel transfer is exact — normalization and the 3-channel
    broadcast run in-graph on device."""
    img = crop_margin(img)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    h, w = img.shape[:2]
    # pick the smallest bucket that fits at uniform scale
    for bh, bw in IMAGE_BUCKETS:
        scale = min(bh / max(h, 1), bw / max(w, 1))
        if scale >= 1.0 or (bh, bw) == IMAGE_BUCKETS[-1]:
            break
    scale = min(bh / max(h, 1), bw / max(w, 1), 1.5)
    rh, rw = max(1, int(h * scale)), max(1, int(w * scale))
    resized = cv2.resize(img, (rw, rh))
    canvas = np.full((bh, bw), 255, np.uint8)
    canvas[:rh, :rw] = resized
    return canvas[..., None], (bh, bw)


class FormulaTokenizer:
    """UniMERNet-style tokenizer wrapper (HF tokenizers format)."""

    def __init__(self, path: Path | None):
        self._tok = None
        if path is not None and path.is_file():
            try:
                from tokenizers import Tokenizer

                self._tok = Tokenizer.from_file(str(path))
            except Exception:
                logger.warning("failed to load formula tokenizer at %s", path)

    def available(self) -> bool:
        return self._tok is not None

    def decode(self, ids: list[int]) -> str:
        if self._tok is None:
            return ""
        text = self._tok.decode(ids, skip_special_tokens=True)
        return fix_latex(text)


class DemoFormulaVocab:
    """Closed-token-list decoder for the demo checkpoint (the vocabulary
    ships in formula_demo.json next to the weights)."""

    def __init__(self, vocab: list[str]):
        self.vocab = vocab

    def available(self) -> bool:
        return True

    def decode(self, ids: list[int]) -> str:
        from ...train.formula import detokenize

        toks = [self.vocab[i] for i in ids
                if 3 <= i < len(self.vocab)]
        return detokenize(toks)


def fix_latex(text: str) -> str:
    """Post-decode LaTeX cleanup (spacing artifacts from BPE)."""
    text = text.replace("\\ ", "\\")
    text = re.sub(r"\\(?=[a-zA-Z])", r" \\", text)
    text = re.sub(r"\s+", " ", text).strip()
    # rebalance braces defensively
    opens, closes = text.count("{"), text.count("}")
    if opens > closes:
        text += "}" * (opens - closes)
    return text


@dataclass
class FormulaConfig:
    max_len: int = 2560
    vocab_size: int = 50000
    layers: int = 6
    backbone_size: str = "B6"
    out_index: int = 3  # backbone stage for memory (3=stride 32, 2=16)
    default_length_bucket: int = 256
    # published PP-FormulaNet_plus-M decoder dims (reference:
    # pp_formulanet_arch_config.yaml); overridable for small-dim
    # full-stack parity tests
    d_model: int = 512
    ffn: int = 2048
    heads: int = 16


class FormulaRecognizer:
    def __init__(self, variables=None, config: FormulaConfig | None = None,
                 seed: int = 0):
        self.config = config or FormulaConfig()
        cfg = self.config
        self.encoder, self.decoder, self.mem_proj, self.mbart_cfg = (
            build_formula_modules(
                max_len=cfg.max_len, vocab_size=cfg.vocab_size,
                layers=cfg.layers, backbone_size=cfg.backbone_size,
                out_index=cfg.out_index, d_model=cfg.d_model,
                ffn=cfg.ffn, heads=cfg.heads,
            )
        )
        variables = dict(variables) if variables else {}
        if not {"encoder", "decoder", "mem_proj"} <= variables.keys():
            # fill missing pieces random-init (e.g. decoder-only npz trees)
            rng = jax.random.PRNGKey(seed)
            if "encoder" not in variables:
                x = np.zeros((1, 96, 384, 3), np.float32)
                variables["encoder"] = self.encoder.init(rng, x)
            stride = 32 if cfg.out_index == 3 else 16
            S0 = (96 // stride) * (384 // stride)
            mem = np.zeros((1, S0, self.mbart_cfg.d_model), np.float32)
            if "mem_proj" not in variables:
                variables["mem_proj"] = self.mem_proj.init(rng, mem)
            if "decoder" not in variables:
                hd = self.mbart_cfg.d_model // self.mbart_cfg.heads
                variables["decoder"] = self.decoder.init(
                    rng,
                    np.zeros((1, 1), np.int32),
                    np.zeros((cfg.layers, 1, 8, self.mbart_cfg.heads, hd), np.float32),
                    np.zeros((cfg.layers, 1, 8, self.mbart_cfg.heads, hd), np.float32),
                    0,
                    np.zeros((cfg.layers, 1, S0, self.mbart_cfg.heads, hd), np.float32),
                    np.zeros((cfg.layers, 1, S0, self.mbart_cfg.heads, hd), np.float32),
                    np.ones((1, S0), bool),
                )
        # commit weights to device once in bf16 — passing host numpy trees
        # into a jitted call re-transfers every leaf per call (hundreds of
        # ms on a tunneled chip), and fp32 params silently promote the
        # whole forward to fp32 (engine/session.py commit_params)
        from ...engine.session import commit_params

        self.variables = commit_params(variables)
        # decoder weight census for AR FLOPs/HBM accounting
        # (engine/flops.py track_ar_extra): per decode step every decoder
        # weight is read once and contributes ~2 FLOPs/param/sample
        dec_leaves = jax.tree.leaves(self.variables["decoder"])
        self._dec_params = float(sum(x.size for x in dec_leaves))
        self._dec_param_bytes = float(
            sum(x.size * x.dtype.itemsize for x in dec_leaves)
        )
        self.tokenizer = FormulaTokenizer(
            get_models_dir() / "formula_tokenizer.json"
        )
        self._compiled: dict = {}

    @classmethod
    def build(cls, configs: dict) -> "FormulaRecognizer":
        from ..registry import _load_variables

        variables = _load_variables(get_models_dir() / "formula_net_plus_m.npz")
        if variables is None:
            # in-repo demo checkpoint trained on mathtext renders
            # (rapiddoc_tpu/train/formula.py) — real LaTeX output without
            # network egress
            import json

            from ..registry import DEMO_ASSETS_DIR

            demo_npz = DEMO_ASSETS_DIR / "formula_demo.npz"
            demo_meta = demo_npz.with_suffix(".json")
            if demo_meta.is_file():
                variables = _load_variables(demo_npz)
                if variables is not None:
                    meta = json.loads(demo_meta.read_text())
                    arch = meta["arch"]
                    vocab = meta["vocab"]
                    logger.info("formula: demo synthetic-trained checkpoint")
                    rec = cls(
                        variables,
                        config=FormulaConfig(
                            max_len=arch["max_len"], vocab_size=len(vocab),
                            layers=arch["layers"],
                            backbone_size=arch["backbone_size"],
                            out_index=arch.get("out_index", 3),
                            default_length_bucket=min(
                                arch["max_len"],
                                FormulaConfig.default_length_bucket,
                            ),
                        ),
                    )
                    rec.tokenizer = DemoFormulaVocab(vocab)
                    return rec
        if variables is None and not configs.get("allow_random_init", False):
            raise FileNotFoundError("formula checkpoint missing")
        return cls(variables)

    def _int8_head(self):
        """Opt-in (RAPIDDOC_INT8_HEAD=1): lm_head quantized to int8 once
        — decode steps then stream half the head bytes from HBM through
        the fused kernel (ops/quant_head.py). Off by default: the greedy
        argmax can flip on quantization near-ties (~<1% of steps at the
        published head shape)."""
        import os

        if not os.environ.get("RAPIDDOC_INT8_HEAD"):
            return None
        cached = getattr(self, "_int8_head_cache", None)
        if cached is None:
            from ...ops.quant_head import quantize_weight_int8

            kernel = self.variables["decoder"]["params"]["lm_head"]["kernel"]
            cached = quantize_weight_int8(np.asarray(kernel, np.float32))
            self._int8_head_cache = cached
        return cached

    def _decode_fn(self, max_len: int):
        fn = self._compiled.get(max_len)
        if fn is None:
            # compute dtype follows weight storage: bf16 by default
            # (RAPIDDOC_FP32_PARAMS=1 stores fp32 — then the decode runs
            # genuinely fp32, which full-stack parity tests rely on)
            leaves = [
                a for a in jax.tree.leaves(self.variables["decoder"])
                if jnp.issubdtype(a.dtype, jnp.floating)
            ]
            cdtype = leaves[0].dtype if leaves else jnp.bfloat16

            def run(enc_vars, dec_vars, mem_vars, images):
                # uint8 luma on the wire; normalize + 3ch broadcast fuse
                # into the encoder's first conv
                x = images.astype(jnp.float32) / 255.0
                x = (x - UNIMER_MEAN) / UNIMER_STD
                if x.shape[-1] == 1:
                    x = jnp.broadcast_to(x, (*x.shape[:-1], 3))
                # keep memory bf16 (default): mem_proj's K/V stacks are
                # read every decode step, fp32 storage doubles that HBM
                # traffic
                memory = self.encoder.apply(enc_vars, x.astype(cdtype))
                mem_mask = jnp.ones(memory.shape[:2], bool)
                return greedy_decode(
                    self.decoder, dec_vars, self.mem_proj, mem_vars,
                    memory, mem_mask, max_len, dtype=cdtype,
                    int8_head=self._int8_head(),
                )

            fn = jax.jit(run, static_argnums=())
            self._compiled[max_len] = fn
        return fn

    def batch_predict(
        self, crops: list[np.ndarray], length_bucket: int | None = None,
        return_ids: bool = False,
    ) -> list:
        """LaTeX per crop; with return_ids, raw token-id lists instead
        (pre-detokenize — the full-stack parity tests compare these
        token-for-token against the torch oracle)."""
        if not crops:
            return []
        max_len = length_bucket or self.config.default_length_bucket
        groups: dict[tuple[int, int], list[int]] = {}
        prepped: list[np.ndarray] = []
        for i, crop in enumerate(crops):
            x, bucket = preprocess_formula(crop)
            prepped.append(x)
            groups.setdefault(bucket, []).append(i)
        out: list[str] = [""] * len(crops)
        fn = self._decode_fn(max_len)
        # dispatch all shape buckets before fetching any result — decodes
        # of different buckets pipeline on the device stream; batch dims
        # are padded to a closed bucket set so compile count stays
        # O(shape-buckets x batch-buckets), not O(distinct group sizes)
        from ...engine.buckets import batch_chunks, pad_rows

        handles = []
        from ...engine.flops import track

        for bucket, idxs in groups.items():
            for s, e, padded in batch_chunks(len(idxs), sizes=(4, 16)):
                batch = pad_rows(
                    np.stack([prepped[i] for i in idxs[s:e]]), padded
                )
                track(
                    "formula", fn,
                    (self.variables["encoder"], self.variables["decoder"],
                     self.variables["mem_proj"], batch),
                    sig=(batch.shape, str(batch.dtype), max_len),
                )
                handles.append(
                    (idxs[s:e], fn(
                        self.variables["encoder"], self.variables["decoder"],
                        self.variables["mem_proj"], jnp.asarray(batch),
                    ))
                )
        from ...engine.flops import track_ar_extra

        for idxs, (tokens, lengths) in handles:
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
            # realized decode length = while_loop trip count (early exit
            # fires when every row is done, so max over the padded batch)
            track_ar_extra(
                "formula", steps=float(lengths.max()),
                batch=int(tokens.shape[0]),
                dec_params=self._dec_params,
                dec_param_bytes=self._dec_param_bytes,
            )
            eos = self.mbart_cfg.eos_token_id
            for j, i in enumerate(idxs):
                n_tok = int(lengths[j])
                # strip the terminator only when one was actually emitted
                # — a decode that exhausts the length budget ends on a
                # real token, which must not be dropped
                if n_tok > 0 and int(tokens[j, n_tok - 1]) == eos:
                    n_tok -= 1
                ids = tokens[j, :n_tok].tolist()
                out[i] = ids if return_ids else self.tokenizer.decode(ids)
        return out
