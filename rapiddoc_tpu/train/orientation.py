"""Demo trainer for the 0/90/180/270 orientation classifier.

Usage: python -m rapiddoc_tpu.train.orientation [steps] [out.npz]

Synthetic pages (train/synth.render_page) rotated by a known angle;
the checkpoint loads straight into models/orientation.OrientationNet.
"""
from __future__ import annotations

import random
import sys
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.orientation.engine import OrientationNet
from ..utils.logging import get_logger
from .bn import apply_mutable, bn_training, join_vars, split_vars
from .synth import render_page

logger = get_logger("rapiddoc_tpu.train.orientation")

SIZE = 224


def make_pool(n: int, seed: int = 0):
    rng = random.Random(seed)
    imgs = np.zeros((n, SIZE, SIZE, 3), np.uint8)
    labels = np.zeros((n,), np.int32)
    for i in range(n):
        # portrait-ish source so 90/270 are distinguishable by content,
        # not canvas shape (the classifier sees a square resize)
        page, _ = render_page(rng, 512)
        page = page[:, : rng.randint(280, 420)]
        k = i % 4
        rot = np.rot90(page, k)  # 0/90/180/270 ccw
        imgs[i] = cv2.resize(rot, (SIZE, SIZE))
        # classifier answers "rotate clockwise by ANGLES[label] to fix";
        # np.rot90(k) rotates ccw by 90k => fix = cw 360-90k
        labels[i] = (4 - k) % 4 if k else 0
    return imgs, labels


def train(steps: int = 1500, out_path=None, pool_n: int = 512,
          batch: int = 16, lr: float = 1e-3, seed: int = 0,
          variables=None):
    model = OrientationNet()
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(seed),
            np.zeros((1, SIZE, SIZE, 3), np.float32),
        )
    params, bstats = split_vars(variables)
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(100, steps // 10), steps
    ))
    opt_state = tx.init(params)

    def loss_fn(params, bstats, x_u8, y):
        x = x_u8.astype(jnp.float32) / 255.0
        logits, new_bs = apply_mutable(model, params, bstats, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y
        ).mean(), new_bs

    @jax.jit
    def step(params, bstats, opt_state, x, y):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats, x, y
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    logger.info("rendering %d rotated pages", pool_n)
    imgs, labels = make_pool(pool_n, seed)
    nrng = np.random.default_rng(seed)
    tic = time.perf_counter()
    with bn_training():
        for i in range(steps):
            idx = nrng.integers(0, pool_n, batch)
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, imgs[idx], labels[idx]
            )
            if i % 20 == 0:
                loss.block_until_ready()
            if i % 100 == 0 or i == steps - 1:
                logger.info("step %d loss %.4f (%.1fs)", i, float(loss),
                            time.perf_counter() - tic)
    variables = join_vars(params, bstats)
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path)
        logger.info("orientation weights -> %s", out_path)
    return variables


def evaluate(variables, n: int = 40, seed: int = 1111) -> float:
    from ..models.orientation.engine import ANGLES, OrientationClassifier

    clf = OrientationClassifier(variables)
    rng = random.Random(seed)
    ok = 0
    for i in range(n):
        page, _ = render_page(rng, 512)
        page = page[:, : rng.randint(280, 420)]
        k = i % 4
        rot = np.rot90(page, k).copy()
        want = (4 - k) % 4 if k else 0
        pred = clf([rot])[0]
        ok += int(pred == ANGLES[want])
    return ok / n


if __name__ == "__main__":
    import os

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
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
    v = train(steps, out, variables=init)
    logger.info("orientation acc: %.3f", evaluate(v))
