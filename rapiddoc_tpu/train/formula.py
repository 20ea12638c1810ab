"""Demo trainer for the formula recognizer (image -> LaTeX).

Usage: python -m rapiddoc_tpu.train.formula [steps] [out.npz]

Trains the production PP-FormulaNet-style stack (models/formula: HGNet
encoder + MBart decoder + memory projector) at a demo scale (B0
backbone, 2 decoder layers, closed LaTeX token vocabulary) on
matplotlib-mathtext renders of random LaTeX from the same grammar the
synthetic layout pages embed (train/synth_layout.random_latex).
Teacher forcing is a single multi-token decoder call (the cached
decoder accepts (B, T) token blocks with a causal mask).

The saved pair (formula_demo.npz + formula_demo.json holding the arch
and the token vocabulary) loads into FormulaRecognizer via
models/formula/engine.build's demo fallback.
"""
from __future__ import annotations

import io
import random
import re
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.common.layers import bn_training
from ..models.formula.engine import UNIMER_MEAN, UNIMER_STD, FormulaConfig
from ..models.formula.model import build_formula_modules
from ..utils.logging import get_logger
from .synth_layout import random_latex

logger = get_logger("rapiddoc_tpu.train.formula")

BUCKET_H, BUCKET_W = 96, 384
MAX_T = 64  # token budget (bos/eos included)

DEMO_ARCH = dict(max_len=160, layers=2, backbone_size="B0", out_index=2)

_TOKEN_RE = re.compile(r"\\[a-zA-Z]+|[^\s]")

SPECIALS = ["<s>", "<pad>", "</s>"]  # ids 0/1/2 = bos/pad/eos (MBartConfig)


def latex_tokenize(s: str) -> list[str]:
    return _TOKEN_RE.findall(s)


def build_vocab(seed: int = 0, probe: int = 2000) -> list[str]:
    """Closed vocabulary of the random_latex grammar (probed, sorted)."""
    rng = random.Random(seed)
    seen: set[str] = set()
    for _ in range(probe):
        seen.update(latex_tokenize(random_latex(rng)))
    return SPECIALS + sorted(seen)


def detokenize(tokens: list[str]) -> str:
    out = []
    for i, t in enumerate(tokens):
        out.append(t)
        nxt = tokens[i + 1] if i + 1 < len(tokens) else ""
        if t.startswith("\\") and t[1:].isalpha() and (
            nxt[:1].isalpha() and not nxt.startswith("\\")
        ):
            out.append(" ")
    return "".join(out)


DPI_CHOICES = [60, 80, 100, 120, 140]


def render_formula(latex: str, rng: random.Random) -> np.ndarray | None:
    """mathtext render -> the EXACT production input: engine
    preprocess_formula (crop-margin, smallest-fitting bucket, top-left
    placement). Returns the (BUCKET_H, BUCKET_W, 1) canvas or None when
    the render fails or lands in a larger bucket."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import mathtext
    from PIL import Image

    from ..models.formula.engine import preprocess_formula

    try:
        buf = io.BytesIO()
        mathtext.math_to_image(
            f"${latex}$", buf, dpi=rng.choice(DPI_CHOICES), format="png"
        )
        buf.seek(0)
        img = np.asarray(Image.open(buf).convert("RGB"), np.uint8)
    except Exception:
        return None
    if img.shape[0] < 6 or img.shape[1] < 6:
        return None
    canvas, bucket = preprocess_formula(img)
    if bucket != (BUCKET_H, BUCKET_W):
        return None
    return canvas


def make_pool(n: int, vocab: list[str], seed: int = 0):
    tok_to_id = {t: i for i, t in enumerate(vocab)}
    rng = random.Random(seed)
    imgs = np.zeros((n, BUCKET_H, BUCKET_W, 1), np.uint8)
    toks = np.full((n, MAX_T), 1, np.int32)  # pad=1
    lens = np.zeros((n,), np.int32)
    texts: list[str] = []
    i = 0
    while i < n:
        latex = random_latex(rng)
        ids = [tok_to_id[t] for t in latex_tokenize(latex)
               if t in tok_to_id]
        if not ids or len(ids) + 1 > MAX_T:
            continue
        img = render_formula(latex, rng)
        if img is None:
            continue
        imgs[i] = img
        seq = ids + [2]  # eos
        toks[i, : len(seq)] = seq
        lens[i] = len(seq)
        texts.append(latex)
        i += 1
        if i % 500 == 0:
            logger.info("pool %d/%d", i, n)
    return imgs, toks, lens, texts


SHARD = 3000  # renders per cache shard (~12 min each on one host CPU)


def _shard_path(k: int) -> str:
    import os

    base = os.environ.get("RAPIDDOC_FORMULA_POOL", "/tmp/formula_pool.npz")
    return base if k == 0 else base.replace(".npz", f"_s{k}.npz")


def load_or_make_pool(n: int, vocab: list[str], seed: int = 0):
    """Sharded disk cache: shard k holds SHARD renders from seed+k
    (mathtext renders are ~250 ms each on the single host CPU —
    pre-render with `python -m rapiddoc_tpu.train.formula pool N`
    while the chip is busy elsewhere). Growing the pool renders only
    the new shards; the original 3000-render shard stays valid."""
    import os

    parts = []
    got = 0
    for k in range((n + SHARD - 1) // SHARD):
        want = min(SHARD, n - got)
        cache = _shard_path(k)
        if os.path.isfile(cache):
            d = np.load(cache, allow_pickle=False)
            if (
                len(d["imgs"]) >= want
                and d["vocab_size"] == len(vocab)
                and int(d["seed"]) == seed + k
            ):
                logger.info("formula pool shard %d from cache %s", k, cache)
                parts.append((d["imgs"][:want], d["toks"][:want],
                              d["lens"][:want]))
                got += want
                continue
        imgs, toks, lens, _ = make_pool(SHARD, vocab, seed + k)
        np.savez(cache, imgs=imgs, toks=toks, lens=lens,
                 vocab_size=len(vocab), seed=seed + k)
        parts.append((imgs[:want], toks[:want], lens[:want]))
        got += want
    imgs = np.concatenate([p[0] for p in parts])
    toks = np.concatenate([p[1] for p in parts])
    lens = np.concatenate([p[2] for p in parts])
    return imgs, toks, lens, []


def train(steps: int = 16000, out_path=None, pool_n: int = 9000,
          batch: int = 16, lr: float = 4e-4, seed: int = 0,
          variables=None):
    """variables: warm start from a saved checkpoint tree (params +
    batch_stats as stored by the registry npz)."""
    vocab = build_vocab()
    cfg = FormulaConfig(
        max_len=DEMO_ARCH["max_len"], vocab_size=len(vocab),
        layers=DEMO_ARCH["layers"], backbone_size=DEMO_ARCH["backbone_size"],
        out_index=DEMO_ARCH["out_index"],
    )
    encoder, decoder, mem_proj, mcfg = build_formula_modules(
        max_len=cfg.max_len, vocab_size=cfg.vocab_size, layers=cfg.layers,
        backbone_size=cfg.backbone_size, out_index=cfg.out_index,
    )
    rng = jax.random.PRNGKey(seed)
    x0 = np.zeros((1, BUCKET_H, BUCKET_W, 3), np.float32)
    enc_vars = encoder.init(rng, x0)
    mem0 = np.asarray(encoder.apply(enc_vars, x0))
    S = mem0.shape[1]
    mem_vars = mem_proj.init(rng, mem0)
    hd = mcfg.d_model // mcfg.heads
    dec_vars = decoder.init(
        rng, np.zeros((1, MAX_T), np.int32),
        np.zeros((cfg.layers, 1, MAX_T, mcfg.heads, hd), np.float32),
        np.zeros((cfg.layers, 1, MAX_T, mcfg.heads, hd), np.float32),
        0,
        np.zeros((cfg.layers, 1, S, mcfg.heads, hd), np.float32),
        np.zeros((cfg.layers, 1, S, mcfg.heads, hd), np.float32),
        np.ones((1, S), bool),
    )
    # Trainable params vs BatchNorm running stats: the encoder trains
    # with per-batch statistics (bn_training trace flag) and accumulates
    # running stats in "batch_stats"; the saved checkpoint carries them
    # so inference (frozen-BN) normalizes identically.
    trainable = {"encoder": enc_vars["params"], "decoder": dec_vars,
                 "mem_proj": mem_vars}
    batch_stats = enc_vars["batch_stats"]
    if variables is not None:
        # warm start: the saved tree is the inference layout
        # ({encoder: {params, batch_stats}, decoder, mem_proj})
        import jax as _jax

        trainable = {
            "encoder": _jax.tree.map(np.asarray,
                                     variables["encoder"]["params"]),
            "decoder": _jax.tree.map(np.asarray, variables["decoder"]),
            "mem_proj": _jax.tree.map(np.asarray, variables["mem_proj"]),
        }
        batch_stats = _jax.tree.map(
            np.asarray, variables["encoder"]["batch_stats"]
        )

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, lr, min(300, steps // 10), steps
        ), weight_decay=1e-4),
    )
    opt_state = tx.init(trainable)

    def augment(x, key):
        """Photometric-only jitter (geometry must match the production
        top-left bucket placement): per-sample contrast about the white
        background, brightness, pixel noise."""
        k1, k2, k3 = jax.random.split(key, 3)
        B = x.shape[0]
        c = jax.random.uniform(k1, (B, 1, 1, 1), minval=0.6, maxval=1.4)
        b = jax.random.uniform(k2, (B, 1, 1, 1), minval=-0.12, maxval=0.12)
        x = jnp.clip((x - 1.0) * c + 1.0 + b, 0.0, 1.0)
        x = x + jax.random.normal(k3, x.shape) * 0.03
        return jnp.clip(x, 0.0, 1.0)

    def loss_fn(trainable, batch_stats, x_u8, tok, lens, key):
        x = x_u8.astype(jnp.float32) / 255.0
        x = augment(x, key)
        x = (x - UNIMER_MEAN) / UNIMER_STD
        x = jnp.broadcast_to(x, (*x.shape[:-1], 3))
        memory, upd = encoder.apply(
            {"params": trainable["encoder"], "batch_stats": batch_stats},
            x, mutable=["batch_stats"],
        )
        memory = memory.astype(jnp.float32)
        mem_mask = jnp.ones(memory.shape[:2], bool)
        mem_k, mem_v = mem_proj.apply(trainable["mem_proj"], memory)
        B, T = tok.shape
        prev = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), tok[:, :-1]], axis=1
        )  # bos=0
        caches_k = jnp.zeros((cfg.layers, B, T, mcfg.heads, hd), jnp.float32)
        caches_v = jnp.zeros_like(caches_k)
        logits, _, _ = decoder.apply(
            trainable["decoder"], prev, caches_k, caches_v, 0,
            mem_k, mem_v, mem_mask,
        )
        mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), tok
        )
        loss = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss, upd["batch_stats"]

    @jax.jit
    def step(trainable, batch_stats, opt_state, x, tok, lens, key):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, batch_stats, x, tok, lens, key
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return (optax.apply_updates(trainable, updates), new_bs, opt_state,
                loss)

    def assemble(trainable, batch_stats):
        return {
            "encoder": {"params": trainable["encoder"],
                        "batch_stats": batch_stats},
            "decoder": trainable["decoder"],
            "mem_proj": trainable["mem_proj"],
        }

    logger.info("rendering %d formulas (mathtext, host-bound)", pool_n)
    imgs, toks, lens, _texts = load_or_make_pool(pool_n, vocab, seed)
    nrng = np.random.default_rng(seed)
    krng = jax.random.PRNGKey(seed + 1)
    tic = time.perf_counter()
    best = None  # (cer, variables) — eval runs frozen-BN, outside the ctx
    eval_every = max(1000, steps // 8)
    for start in range(0, steps, eval_every):
        with bn_training():
            for i in range(start, min(start + eval_every, steps)):
                idx = nrng.integers(0, pool_n, batch)
                krng, sub = jax.random.split(krng)
                trainable, batch_stats, opt_state, loss = step(
                    trainable, batch_stats, opt_state,
                    imgs[idx], toks[idx], lens[idx], sub
                )
                if i % 20 == 0:
                    loss.block_until_ready()
                if i % 100 == 0 or i == steps - 1:
                    logger.info("step %d loss %.4f (%.1fs)", i, float(loss),
                                time.perf_counter() - tic)
        v = assemble(trainable, batch_stats)
        m = evaluate(v, vocab, n=16)
        logger.info("step %d heldout %s", min(start + eval_every, steps), m)
        if best is None or m["cer~"] < best[0]:
            best = (m["cer~"], jax.tree.map(np.asarray, v))
            if out_path is not None:
                save_demo(best[1], vocab, out_path)
    variables = best[1] if best is not None else assemble(
        trainable, batch_stats
    )
    return variables, vocab


def save_demo(variables, vocab: list[str], out_path) -> None:
    import json
    from pathlib import Path

    from ..models.registry import save_variables

    out_path = Path(out_path)
    save_variables(variables, out_path, half=True)
    out_path.with_suffix(".json").write_text(
        json.dumps({"arch": DEMO_ARCH, "vocab": vocab})
    )
    logger.info("formula weights -> %s (+ .json arch/vocab)", out_path)


def evaluate(variables=None, vocab=None, n: int = 24, seed: int = 4242):
    """Greedy-decode held-out renders: exact-match + char error rate."""
    from ..models.formula.engine import DemoFormulaVocab, FormulaRecognizer

    cfg = FormulaConfig(
        max_len=DEMO_ARCH["max_len"], vocab_size=len(vocab),
        layers=DEMO_ARCH["layers"], backbone_size=DEMO_ARCH["backbone_size"],
        out_index=DEMO_ARCH["out_index"],
    )
    rec = FormulaRecognizer(variables, config=cfg)
    rec.tokenizer = DemoFormulaVocab(vocab)
    rng = random.Random(seed)
    crops = []
    truths = []
    while len(crops) < n:
        latex = random_latex(rng)
        if len(latex_tokenize(latex)) + 1 > MAX_T:
            continue
        img = render_formula(latex, rng)
        if img is None:
            continue
        crops.append(np.repeat(img, 3, axis=-1))
        truths.append(latex)
    preds = rec.batch_predict(crops, length_bucket=MAX_T)

    def norm(s):
        return re.sub(r"\s+", "", s)

    import difflib

    exact = cers = 0.0
    for p, t in zip(preds, truths):
        pn, tn = norm(p), norm(t)
        exact += pn == tn
        sm = difflib.SequenceMatcher(a=pn, b=tn)
        cers += 1.0 - sm.ratio()
    return {"exact": exact / n, "cer~": cers / n}


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "pool":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
        load_or_make_pool(n, build_vocab())
    else:
        steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
        out = sys.argv[2] if len(sys.argv) > 2 else None
        init = None
        if out and os.path.isfile(out) and not os.environ.get(
            "RAPIDDOC_TRAIN_FRESH"
        ):
            from pathlib import Path

            from ..models.registry import _load_variables

            init = _load_variables(Path(out))
            if init is not None:
                logger.info("warm start from %s", out)
        seed = int(os.environ.get(
            "RAPIDDOC_TRAIN_SEED", "23" if init is not None else "0"
        ))
        v, vocab = train(steps, out, seed=seed, variables=init)
        logger.info("eval: %s", evaluate(v, vocab))
