"""Demo trainers for the table stack (UNET / wired-wireless cls / SLANet).

Usage:
    python -m rapiddoc_tpu.train.table unet   [steps] [out.npz]
    python -m rapiddoc_tpu.train.table cls    [steps] [out.npz]
    python -m rapiddoc_tpu.train.table slanet [steps] [out.npz]

All three train on rapiddoc_tpu.train.synth_table tables, whose drawn
grid lines / wiring / HTML token stream are exact ground truth. The
resulting checkpoints load straight into the production modules
(models/table/{unet,cls,slanet}.py) — same architectures, no key maps.
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

from ..models.table.cls import TableClsNet
from ..models.table.slanet import (
    IMG_SIZE as SLA_SIZE,
    FeaKey,
    SLAHeadStep,
    SLANetBackbone,
    SLANetConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
    PANNeck,
    SLANetVocab,
)
from ..models.table.unet import UNet
from ..utils.logging import get_logger
from .bn import apply_mutable, bn_training, join_vars, split_vars
from .synth_table import render_table, slanet_sample

logger = get_logger("rapiddoc_tpu.train.table")

UNET_SIZE = 1024  # the production WiredTableStructure input
CLS_SIZE = 224
SLA_TRAIN_STEPS = 160  # token budget for training tables (decode uses 512)


# ----------------------------------------------------------------- UNET

def make_unet_pool(n: int, seed: int = 0):
    rng = random.Random(seed)
    imgs = np.zeros((n, UNET_SIZE, UNET_SIZE, 3), np.uint8)
    masks = np.zeros((n, UNET_SIZE, UNET_SIZE), np.uint8)
    for i in range(n):
        s = render_table(rng, wired=True)
        imgs[i] = cv2.resize(s.img, (UNET_SIZE, UNET_SIZE))
        m = cv2.resize(
            s.line_mask * 255, (UNET_SIZE, UNET_SIZE),
            interpolation=cv2.INTER_LINEAR,
        )
        masks[i] = (m > 64).astype(np.uint8)
    return imgs, masks


def train_unet(steps: int = 1500, out_path=None, pool_n: int = 256,
               batch: int = 2, lr: float = 1e-3, seed: int = 0):
    model = UNet()
    variables = model.init(
        jax.random.PRNGKey(seed), np.zeros((1, 256, 256, 3), np.float32)
    )
    params, bstats = split_vars(variables)
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(100, steps // 10), steps
    ))
    opt_state = tx.init(params)

    def loss_fn(params, bstats, x_u8, y_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        y = y_u8.astype(jnp.float32)
        logits, new_bs = apply_mutable(model, params, bstats, x)
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -(y * logp[..., 1] + (1 - y) * logp[..., 0])
        pos = y.sum() + 1.0
        w = pos / (y.size - pos + 1.0) * 3.0
        ce = jnp.where(y > 0.5, ce, ce * w).mean()
        p = jax.nn.softmax(logits, axis=-1)[..., 1]
        dice = 1.0 - 2.0 * (p * y).sum() / (p.sum() + y.sum() + 1.0)
        return ce + dice, new_bs

    @jax.jit
    def step(params, bstats, opt_state, x, y):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats, x, y
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    logger.info("rendering %d wired tables @%d", pool_n, UNET_SIZE)
    imgs, masks = make_unet_pool(pool_n, seed)
    nrng = np.random.default_rng(seed)
    tic = time.perf_counter()
    with bn_training():
        for i in range(steps):
            idx = nrng.integers(0, pool_n, batch)
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, imgs[idx], masks[idx]
            )
            if i % 20 == 0:
                loss.block_until_ready()
            if i % 100 == 0 or i == steps - 1:
                logger.info("unet step %d loss %.4f (%.1fs)", i, float(loss),
                            time.perf_counter() - tic)
    variables = join_vars(params, bstats)
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path)
        logger.info("unet weights -> %s", out_path)
    return variables


def eval_unet(variables, n_tables: int = 10, seed: int = 7777) -> float:
    """Cell recall at IoU 0.5 through the production host recovery."""
    from ..models.table.unet import WiredTableStructure

    wired = WiredTableStructure(variables)
    rng = random.Random(seed)
    hit = total = 0
    for _ in range(n_tables):
        s = render_table(rng, wired=True)
        cells, _grid = wired(s.img)
        pred = np.array(cells, np.float32).reshape(-1, 4)
        for x0, y0, x1, y1 in s.cell_boxes:
            total += 1
            if not len(pred):
                continue
            ix0 = np.maximum(pred[:, 0], x0)
            iy0 = np.maximum(pred[:, 1], y0)
            ix1 = np.minimum(pred[:, 2], x1)
            iy1 = np.minimum(pred[:, 3], y1)
            inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
            union = (
                (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
                + (x1 - x0) * (y1 - y0) - inter
            )
            if (inter / np.maximum(union, 1e-9)).max() >= 0.5:
                hit += 1
    return hit / max(total, 1)


# ------------------------------------------------------------------ cls

def train_cls(steps: int = 1200, out_path=None, pool_n: int = 512,
              batch: int = 16, lr: float = 1e-3, seed: int = 0):
    model = TableClsNet()
    variables = model.init(
        jax.random.PRNGKey(seed), np.zeros((1, CLS_SIZE, CLS_SIZE, 3),
                                           np.float32)
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

    logger.info("rendering %d cls tables", pool_n)
    rng = random.Random(seed)
    imgs = np.zeros((pool_n, CLS_SIZE, CLS_SIZE, 3), np.uint8)
    labels = np.zeros((pool_n,), np.int32)
    for i in range(pool_n):
        wired = i % 2 == 0
        s = render_table(rng, wired=wired)
        imgs[i] = cv2.resize(s.img, (CLS_SIZE, CLS_SIZE))
        labels[i] = 0 if wired else 1
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
                logger.info("cls step %d loss %.4f (%.1fs)", i, float(loss),
                            time.perf_counter() - tic)
    variables = join_vars(params, bstats)
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path)
        logger.info("cls weights -> %s", out_path)
    return variables


def eval_cls(variables, n: int = 40, seed: int = 5555) -> float:
    from ..models.table.cls import TableClassifier

    clf = TableClassifier(variables)
    rng = random.Random(seed)
    ok = 0
    for i in range(n):
        wired = i % 2 == 0
        s = render_table(rng, wired=wired)
        pred = clf([s.img])[0]
        ok += int(pred == ("wired" if wired else "wireless"))
    return ok / n


# --------------------------------------------------------------- SLANet

def make_sla_pool(n: int, vocab, seed: int = 0):
    rng = random.Random(seed)
    imgs = np.zeros((n, SLA_SIZE, SLA_SIZE, 3), np.uint8)
    toks = np.zeros((n, SLA_TRAIN_STEPS), np.int32)
    locs = np.zeros((n, SLA_TRAIN_STEPS, 8), np.float32)
    lmask = np.zeros((n, SLA_TRAIN_STEPS), np.float32)
    lens = np.zeros((n,), np.int32)
    i = 0
    while i < n:
        s = slanet_sample(rng, vocab, SLA_TRAIN_STEPS)
        if s is None:
            continue
        imgs[i], toks[i], locs[i], lmask[i], lens[i] = s
        i += 1
    return imgs, toks, locs, lmask, lens


def train_slanet(steps: int = 4000, out_path=None, pool_n: int = 3072,
                 batch: int = 8, lr: float = 1e-3, seed: int = 0,
                 variables=None):
    warm = variables is not None
    cfg = SLANetConfig()
    vocab = SLANetVocab()
    backbone = SLANetBackbone(cfg.scale)
    neck = PANNeck(cfg.neck_ch)
    step_mod = SLAHeadStep(len(vocab), cfg.hidden)
    fea_key = FeaKey(cfg.hidden)
    rng = jax.random.PRNGKey(seed)
    x0 = np.zeros((1, SLA_SIZE, SLA_SIZE, 3), np.float32)
    bb_vars = backbone.init(rng, x0)
    feats = backbone.apply(bb_vars, x0)
    neck_vars = neck.init(rng, feats)
    fea_map = neck.apply(neck_vars, feats)
    S = fea_map.shape[1] * fea_map.shape[2]
    fea0 = np.zeros((1, S, cfg.neck_ch), np.float32)
    fk_vars = fea_key.init(rng, fea0)
    step_vars = step_mod.init(
        rng, np.zeros((1, cfg.hidden), np.float32), np.zeros((1,), np.int32),
        fea0, np.zeros((1, S, cfg.hidden), np.float32),
    )
    if variables is None:
        variables = {"backbone": bb_vars, "neck": neck_vars,
                     "fea_key": fk_vars, "step": step_vars}
    # split trainable params from BN running stats (trained with batch
    # statistics under bn_training; running stats ship in the checkpoint)
    trainable = {
        "backbone": variables["backbone"]["params"],
        "neck": variables["neck"]["params"],
        "fea_key": variables["fea_key"],
        "step": variables["step"],
    }
    bstats = {
        "backbone": variables["backbone"].get(
            "batch_stats", bb_vars["batch_stats"]
        ),
        "neck": variables["neck"].get("batch_stats", neck_vars["batch_stats"]),
    }

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, lr, min(200, steps // 10), steps
        )),
    )
    opt_state = tx.init(trainable)

    def loss_fn(trainable, bstats, x_u8, tok, loc, lmask, lens, coins):
        x = x_u8.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        feats, bb_upd = backbone.apply(
            {"params": trainable["backbone"],
             "batch_stats": bstats["backbone"]},
            x, mutable=["batch_stats"],
        )
        fea_map, neck_upd = neck.apply(
            {"params": trainable["neck"], "batch_stats": bstats["neck"]},
            feats, mutable=["batch_stats"],
        )
        new_bs = {"backbone": bb_upd["batch_stats"],
                  "neck": neck_upd["batch_stats"]}
        b, h, w, c = fea_map.shape
        fea = fea_map.reshape(b, h * w, c).astype(jnp.float32)
        fkey = fea_key.apply(trainable["fea_key"], fea)
        B, T = tok.shape
        # teacher forcing with SCHEDULED SAMPLING: prev token stream =
        # [sos, tok[:-1]], but where coins[t] is set, the model's own
        # step-(t-1) argmax is fed instead — the greedy decode at
        # inference runs on its own predictions, and pure teacher forcing
        # leaves the hidden state brittle to its first mistake (measured:
        # token error 7.7% free-run at 0.03 TF loss)
        prev = jnp.concatenate(
            [jnp.full((B, 1), vocab.sos_id, jnp.int32), tok[:, :-1]], axis=1
        )
        hidden = jnp.zeros((B, cfg.hidden), fea.dtype)
        prev_pred0 = jnp.full((B,), vocab.sos_id, jnp.int32)

        def scan_body(carry, inputs):
            hidden, prev_pred = carry
            gt_prev, coin = inputs
            prev_t = jnp.where(coin, prev_pred, gt_prev)
            hidden, logits, locp = step_mod.apply(
                trainable["step"], hidden, prev_t, fea, fkey
            )
            pred = jnp.argmax(
                jax.lax.stop_gradient(logits).astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
            return (hidden, pred), (logits, locp)

        (_, _), (logits, locp) = jax.lax.scan(
            scan_body, (hidden, prev_pred0), (prev.T, coins)
        )  # (T, B, V), (T, B, 8)
        logits = jnp.transpose(logits, (1, 0, 2)).astype(jnp.float32)
        locp = jnp.transpose(locp, (1, 0, 2)).astype(jnp.float32)
        step_mask = (
            jnp.arange(T)[None, :] < lens[:, None]
        ).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, tok)
        ce = (ce * step_mask).sum() / jnp.maximum(step_mask.sum(), 1.0)
        l1 = (jnp.abs(locp - loc).sum(-1) * lmask).sum() / jnp.maximum(
            lmask.sum(), 1.0
        )
        return ce + 2.0 * l1, new_bs

    @jax.jit
    def train_step(trainable, bstats, opt_state, x, tok, loc, lmask, lens,
                   coins):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, bstats, x, tok, loc, lmask, lens, coins
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(trainable, updates), new_bs, opt_state, loss

    def assemble(trainable, bstats):
        return {
            "backbone": {"params": trainable["backbone"],
                         "batch_stats": bstats["backbone"]},
            "neck": {"params": trainable["neck"],
                     "batch_stats": bstats["neck"]},
            "fea_key": trainable["fea_key"],
            "step": trainable["step"],
        }

    logger.info("rendering %d slanet tables", pool_n)
    imgs, toks, locs, lmask, lens = make_sla_pool(pool_n, vocab, seed)

    # continuous pool refresh while the chip trains (see train/unitable.py:
    # a fixed pool gets memorized; streaming fresh tables bounds repeats)
    import threading

    pool_lock = threading.Lock()
    stop_refresh = threading.Event()
    refreshed = [0]

    def _refresh():
        rrng = random.Random(seed + 101)
        nidx = np.random.default_rng(seed + 202)
        while not stop_refresh.is_set():
            s = slanet_sample(rrng, vocab, SLA_TRAIN_STEPS)
            if s is None:
                continue
            j = int(nidx.integers(0, pool_n))
            with pool_lock:
                imgs[j], toks[j], locs[j], lmask[j], lens[j] = s
            refreshed[0] += 1

    threading.Thread(target=_refresh, daemon=True).start()

    nrng = np.random.default_rng(seed)
    tic = time.perf_counter()
    with bn_training():
        for i in range(steps):
            idx = nrng.integers(0, pool_n, batch)
            # scheduled-sampling rate: fresh runs learn the grammar
            # teacher-forced for a quarter then ramp to 0.35; warm
            # continues (model already decodes) ramp over 1k steps
            if warm:
                p = min(0.35, 0.35 * i / 1000.0)
            else:
                p = 0.0 if i < steps // 4 else min(
                    0.35, 0.35 * (i - steps // 4) / max(steps // 4, 1)
                )
            coins = nrng.random((SLA_TRAIN_STEPS, batch)) < p
            with pool_lock:
                batch_arrs = (imgs[idx].copy(), toks[idx].copy(),
                              locs[idx].copy(), lmask[idx].copy(),
                              lens[idx].copy())
            trainable, bstats, opt_state, loss = train_step(
                trainable, bstats, opt_state, *batch_arrs, coins,
            )
            if i % 20 == 0:
                loss.block_until_ready()
            if i % 100 == 0 or i == steps - 1:
                logger.info("slanet step %d loss %.4f p_ss %.2f (%.1fs)", i,
                            float(loss), p, time.perf_counter() - tic)
            if out_path is not None and i and i % 1000 == 0:
                from ..models.registry import save_variables

                save_variables(assemble(trainable, bstats), out_path)
    stop_refresh.set()
    variables = assemble(trainable, bstats)
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path)
        logger.info("slanet weights -> %s", out_path)
    return variables


def eval_slanet(variables, n: int = 24, seed: int = 3333):
    """Structure-token exact-sequence rate, TEDS-S (structure-only tree
    edit distance similarity — the OmniDocBench/PubTabNet table metric),
    and mean cell-box IoU."""
    from ..models.table.slanet import SLANetStructure
    from ..utils.teds import teds

    sla = SLANetStructure(variables)
    rng = random.Random(seed)
    seq_ok = 0
    ious = []
    teds_scores = []
    for _ in range(n):
        s = render_table(rng, wired=rng.random() < 0.5)
        (structure, bboxes), = sla([s.img])
        teds_scores.append(teds(
            "<table>" + "".join(structure) + "</table>",
            "<table>" + "".join(s.tokens) + "</table>",
            structure_only=True,
        ))
        if structure == s.tokens:
            seq_ok += 1
        for pred, gt in zip(bboxes, s.cell_boxes):
            x0, y0, x1, y1 = gt
            px0, py0, px1, py1 = pred
            iw = max(0.0, min(px1, x1) - max(px0, x0))
            ih = max(0.0, min(py1, y1) - max(py0, y0))
            inter = iw * ih
            union = (
                (px1 - px0) * (py1 - py0) + (x1 - x0) * (y1 - y0) - inter
            )
            ious.append(inter / max(union, 1e-9))
    return {"seq_acc": seq_ok / n,
            "teds_s": float(np.mean(teds_scores)) if teds_scores else 0.0,
            "cell_iou": float(np.mean(ious)) if ious else 0.0}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "unet"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else None
    out = sys.argv[3] if len(sys.argv) > 3 else None
    init = None
    import os

    if out and os.path.isfile(out) and not os.environ.get(
        "RAPIDDOC_TRAIN_FRESH"
    ):
        from ..models.registry import _load_variables
        from pathlib import Path

        init = _load_variables(Path(out))
        if init is not None:
            logger.info("warm start from %s", out)
    if which == "unet":
        v = train_unet(steps or 1500, out)
        logger.info("unet cell recall: %.3f", eval_unet(v))
    elif which == "cls":
        v = train_cls(steps or 1200, out)
        logger.info("cls acc: %.3f", eval_cls(v))
    elif which == "slanet":
        # warm continues default to a FRESH pool seed: re-touring the
        # pool the model already fits teaches nothing about free-run
        # generalization
        seed = int(os.environ.get(
            "RAPIDDOC_TRAIN_SEED", "17" if init is not None else "0"
        ))
        v = train_slanet(steps or 4000, out, variables=init, seed=seed)
        logger.info("slanet eval: %s", eval_slanet(v))
    else:
        raise SystemExit(f"unknown target {which}")
