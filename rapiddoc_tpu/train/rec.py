"""Train SVTR/CTC recognition on synthetic text lines (demo rec weights).

Usage: python -m rapiddoc_tpu.train.rec [steps] [out.npz]

CTC objective (optax.ctc_loss, blank=0) over the demo ASCII charset;
vocabulary layout matches CTCLabelDecoder ([blank] + charset + [' ']).
"""
from __future__ import annotations

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.ocr.pre_post import rec_normalize_device
from ..models.ocr.rec import SVTRRec, ctc_greedy_decode
from .bn import apply_mutable, bn_training, join_vars, split_vars
from ..utils.logging import get_logger
from .synth import (
    DEMO_CHARSET,
    LANG_CHARSETS,
    encode_text,
    rec_sample,
    rec_sample_lang,
)

logger = get_logger("rapiddoc_tpu.train.rec")

WIDTH = 320
HEIGHT = 48
MAX_LABEL = 32
NUM_CLASSES = len(DEMO_CHARSET) + 2  # blank + charset + space


def make_pool(n: int, seed: int = 0, lang: str | None = None):
    charset = LANG_CHARSETS.get(lang or "", DEMO_CHARSET)
    rng = random.Random(seed)
    imgs = np.zeros((n, HEIGHT, WIDTH, 3), np.uint8)
    labels = np.zeros((n, MAX_LABEL), np.int32)
    label_pad = np.ones((n, MAX_LABEL), np.float32)
    for i in range(n):
        if lang:
            img, text = rec_sample_lang(rng, lang, WIDTH, HEIGHT)
        else:
            img, text = rec_sample(rng, WIDTH, HEIGHT)
        ids = encode_text(text, charset)[:MAX_LABEL]
        imgs[i] = img
        labels[i, : len(ids)] = ids
        label_pad[i, : len(ids)] = 0.0
    return imgs, labels, label_pad


def loss_fn(params, bstats, model, x_u8, labels, label_pad):
    x = rec_normalize_device(x_u8)
    logits, new_bs = apply_mutable(model, params, bstats, x)
    logits = logits.astype(jnp.float32)
    logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
    per = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=0)
    return per.mean(), new_bs


def train(steps: int = 3000, out_path=None, pool_size: int = 4096,
          batch: int = 64, lr: float = 1e-3, seed: int = 0,
          init_from: str | None = None, lang: str | None = None):
    charset = LANG_CHARSETS.get(lang or "", DEMO_CHARSET)
    model = SVTRRec(num_classes=len(charset) + 2)
    variables = model.init(
        jax.random.PRNGKey(seed), np.zeros((1, HEIGHT, WIDTH, 3), np.float32)
    )
    if init_from:
        from ..models.registry import _load_variables

        from pathlib import Path

        warm = _load_variables(Path(init_from))
        if warm is None:
            raise FileNotFoundError(init_from)
        variables = warm
        logger.info("warm start from %s", init_from)
    params, bstats = split_vars(variables)
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(200, steps // 10), steps
    ))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, x, labels, label_pad):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats, model, x, labels, label_pad
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    logger.info("rendering %d synthetic lines (lang=%s)", pool_size,
                lang or "en")
    imgs, labels, label_pad = make_pool(pool_size, seed, lang=lang)
    nrng = np.random.default_rng(seed)
    tic = time.perf_counter()
    with bn_training():
        for i in range(steps):
            idx = nrng.integers(0, pool_size, batch)
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state,
                imgs[idx], labels[idx], label_pad[idx]
            )
            if i % 20 == 0:
                # bound in-flight async dispatches (see train/det.py: a
                # stalled tunnel otherwise queues GBs before the
                # logging sync)
                loss.block_until_ready()
            if i % 200 == 0 or i == steps - 1:
                logger.info(
                    "step %d loss %.4f (%.1fs)", i, float(loss),
                    time.perf_counter() - tic,
                )
    variables = join_vars(params, bstats)
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path)
        logger.info("rec weights -> %s", out_path)
    return variables


def evaluate(variables, n: int = 128, seed: int = 4242,
             lang: str | None = None) -> float:
    """Exact-match accuracy on held-out synthetic lines."""
    from ..models.ocr.pre_post import CTCLabelDecoder

    charset = LANG_CHARSETS.get(lang or "", DEMO_CHARSET)
    model = SVTRRec(num_classes=len(charset) + 2)
    decoder = CTCLabelDecoder(charset)
    rng = random.Random(seed)
    imgs = []
    texts = []
    for _ in range(n):
        if lang:
            img, text = rec_sample_lang(rng, lang, WIDTH, HEIGHT)
        else:
            img, text = rec_sample(rng, WIDTH, HEIGHT)
        imgs.append(img)
        texts.append(text)

    @jax.jit
    def fwd(v, x):
        x = rec_normalize_device(x).astype(jnp.bfloat16)
        return ctc_greedy_decode(model.apply(v, x).astype(jnp.float32))

    ids, probs = fwd(variables, np.stack(imgs))
    ids = np.asarray(ids)
    probs = np.asarray(probs)
    ok = 0
    for i, text in enumerate(texts):
        got, _ = decoder(ids[i], probs[i])
        ok += got == text
    return ok / n


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--lang")]
    lang = None
    for a in sys.argv[1:]:
        if a.startswith("--lang="):
            lang = a.split("=", 1)[1]
    steps = int(args[0]) if len(args) > 0 else 3000
    out = args[1] if len(args) > 1 else None
    warm = args[2] if len(args) > 2 else None
    v = train(steps, out, init_from=warm, lang=lang)
    logger.info("exact match: %.3f", evaluate(v, lang=lang))
