"""Train DBNet on synthetic pages (demo det weights).

Usage: python -m rapiddoc_tpu.train.det [steps] [out.npz]

Binary-segmentation objective on the DB shrink mask (BCE + dice), Adam.
Runs on whatever JAX backend is default (TPU here); host-side page
rendering is hidden behind a pregenerated pool.
"""
from __future__ import annotations

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.ocr.det import DBNet
from ..models.ocr.pre_post import det_normalize_device
from .bn import apply_mutable, bn_training, join_vars, split_vars
from ..utils.logging import get_logger
from .synth import db_prob_target, render_page

logger = get_logger("rapiddoc_tpu.train.det")

SIZE = 640


def make_pool(n_pages: int, seed: int = 0):
    rng = random.Random(seed)
    imgs = np.zeros((n_pages, SIZE, SIZE, 3), np.uint8)
    # uint8 0/1 targets: 4x less host->device traffic than float32
    targets = np.zeros((n_pages, SIZE, SIZE), np.uint8)
    from .synth import scan_wash

    for i in range(n_pages):
        img, boxes = render_page(rng, SIZE)
        if rng.random() < 0.4:
            # photometric only (ink fade / gamma / JPEG) — box targets
            # are geometry and stay valid
            img = scan_wash(img, rng)
        imgs[i] = img
        targets[i] = db_prob_target(boxes, SIZE).astype(np.uint8)
    return imgs, targets


def loss_fn(params, bstats, model, x_u8, y):
    y = y.astype(jnp.float32)
    x = det_normalize_device(x_u8)
    prob, new_bs = apply_mutable(model, params, bstats, x)
    prob = prob[..., 0].astype(jnp.float32)
    p = jnp.clip(prob, 1e-5, 1 - 1e-5)
    bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    # class-balanced: positives are sparse
    pos = y.sum() + 1.0
    neg_w = pos / (y.size - pos + 1.0) * 3.0
    bce = jnp.where(y > 0.5, bce, bce * neg_w).mean()
    inter = (p * y).sum()
    dice = 1.0 - 2.0 * inter / (p.sum() + y.sum() + 1.0)
    return bce + dice, new_bs


def train(steps: int = 1200, out_path=None, pool_pages: int = 192,
          batch: int = 4, lr: float = 2e-3, seed: int = 0):
    model = DBNet()
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, np.zeros((1, SIZE, SIZE, 3), np.float32))
    params, bstats = split_vars(variables)
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(100, steps // 10), steps
    ))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, x, y):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats, model, x, y
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    logger.info("rendering %d synthetic pages", pool_pages)
    imgs, targets = make_pool(pool_pages, seed)
    nrng = np.random.default_rng(seed)
    tic = time.perf_counter()
    with bn_training():
        for i in range(steps):
            idx = nrng.integers(0, pool_pages, batch)
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, imgs[idx], targets[idx]
            )
            if i % 20 == 0:
                # bound in-flight async dispatches: a stalled tunnel
                # otherwise queues GBs of host transfer buffers before
                # the next logging sync notices (observed: 80 GB RSS
                # wedge)
                loss.block_until_ready()
            if i % 100 == 0 or i == steps - 1:
                logger.info(
                    "step %d loss %.4f (%.1fs)", i, float(loss),
                    time.perf_counter() - tic,
                )
    variables = join_vars(params, bstats)
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path)
        logger.info("det weights -> %s", out_path)
    return variables


def evaluate(variables, n_pages: int = 8, seed: int = 999) -> float:
    """Line-level recall: fraction of GT boxes hit by a detected box."""
    from ..models.ocr.engine import TextDetector

    det = TextDetector(variables)
    rng = random.Random(seed)
    hit = total = 0
    for _ in range(n_pages):
        img, boxes = render_page(rng, SIZE)
        found = det([img])[0].boxes
        for x0, y0, x1, y1 in boxes:
            total += 1
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            for quad in found:
                xs = quad[:, 0]
                ys = quad[:, 1]
                if xs.min() <= cx <= xs.max() and ys.min() <= cy <= ys.max():
                    hit += 1
                    break
    return hit / max(total, 1)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    out = sys.argv[2] if len(sys.argv) > 2 else None
    v = train(steps, out)
    logger.info("line recall: %.3f", evaluate(v))
