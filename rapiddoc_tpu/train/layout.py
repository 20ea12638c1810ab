"""Train the RT-DETR layout detector on synthetic labeled pages
(demo layout weights).

Usage: python -m rapiddoc_tpu.train.layout [steps] [out.npz]

DETR recipe: Hungarian matching (scipy, host) against per-decoder-layer
predictions + the encoder query-selection head (which is detached from
the decoder path and gets no gradient without its own loss), sigmoid
focal classification, L1 + GIoU box regression. The matching runs on a
separate jitted forward pass; the grad step recomputes the forward with
the matched targets (the page batch is device_put once and shared).
"""
from __future__ import annotations

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.optimize import linear_sum_assignment

from ..models.layout.rtdetr import RTDETR
from ..utils.logging import get_logger
from .bn import apply_mutable, bn_training, join_vars, split_vars
from .synth_layout import render_layout_page

logger = get_logger("rapiddoc_tpu.train.layout")

SIZE = 640
NUM_CLASSES = 25
MAX_T = 56  # targets per page, padded

# demo arch (must match the config saved next to the checkpoint —
# LayoutDetector.build reads it from layout_demo.json)
DEMO_ARCH = dict(
    model_size="B0", input_size=SIZE, num_queries=60, dec_layers=3,
    with_masks=False,
)

W_CLS, W_L1, W_GIOU = 2.0, 5.0, 2.0
FOCAL_ALPHA, FOCAL_GAMMA = 0.25, 2.0


def make_model(aux: bool) -> RTDETR:
    return RTDETR(
        num_classes=NUM_CLASSES,
        backbone_size=DEMO_ARCH["model_size"],
        num_queries=DEMO_ARCH["num_queries"],
        dec_layers=DEMO_ARCH["dec_layers"],
        with_masks=DEMO_ARCH["with_masks"],
        aux=aux,
    )


# page aspect ratios (h/w): square scans, 4:3, letter, A4 — the
# detector squishes every page to a fixed square (as the reference
# PP-DocLayout preprocess does), so training must see squished portrait
# pages too
ASPECTS = (1.0, 1.2, 1.294, 1.414)


def _render_training_page(rng: random.Random):
    """(SIZE x SIZE squished page, gt in squished pixels)."""
    import cv2

    aspect = rng.choice(ASPECTS)
    h = int(SIZE * aspect)
    img, gt = render_layout_page(rng, SIZE, height=h)
    if h != SIZE:
        img = cv2.resize(img, (SIZE, SIZE), interpolation=cv2.INTER_AREA)
        sy = SIZE / h
        gt = [
            (cid, x0, y0 * sy, x1, y1 * sy) for cid, x0, y0, x1, y1 in gt
        ]
    return img, gt


def make_pool(n_pages: int, seed: int = 0):
    rng = random.Random(seed)
    imgs = np.zeros((n_pages, SIZE, SIZE, 3), np.uint8)
    tcls = np.full((n_pages, MAX_T), -1, np.int32)
    tbox = np.zeros((n_pages, MAX_T, 4), np.float32)  # cxcywh [0,1]
    for i in range(n_pages):
        img, gt = _render_training_page(rng)
        imgs[i] = img
        for j, (cid, x0, y0, x1, y1) in enumerate(gt[:MAX_T]):
            tcls[i, j] = cid
            tbox[i, j] = (
                (x0 + x1) / 2 / SIZE, (y0 + y1) / 2 / SIZE,
                (x1 - x0) / SIZE, (y1 - y0) / SIZE,
            )
    return imgs, tcls, tbox


def _giou_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """GIoU matrix for cxcywh boxes: (Na, Nb)."""
    def to_xyxy(b):
        return np.stack(
            [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
             b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1,
        )

    a, b = to_xyxy(boxes_a), to_xyxy(boxes_b)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    iou = inter / np.maximum(union, 1e-9)
    lt_c = np.minimum(a[:, None, :2], b[None, :, :2])
    rb_c = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh_c = np.clip(rb_c - lt_c, 0, None)
    hull = wh_c[..., 0] * wh_c[..., 1]
    return iou - (hull - union) / np.maximum(hull, 1e-9)


def match_batch(logits, boxes, tcls, tbox):
    """Hungarian match one prediction set against targets.

    logits (B, Nq, C) f32, boxes (B, Nq, 4); tcls (B, MAX_T) int (-1 pad).
    Returns per-query targets: qcls (B, Nq) int32 (-1 = background),
    qbox (B, Nq, 4).
    """
    B, Nq, _ = logits.shape
    qcls = np.full((B, Nq), -1, np.int32)
    qbox = np.zeros((B, Nq, 4), np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    for b in range(B):
        valid = tcls[b] >= 0
        T = int(valid.sum())
        if T == 0:
            continue
        tc = tcls[b, :T]
        tb = tbox[b, :T]
        cost_cls = -probs[b][:, tc]  # (Nq, T)
        cost_l1 = np.abs(boxes[b][:, None, :] - tb[None]).sum(-1)
        cost_giou = -_giou_np(boxes[b], tb)
        cost = W_CLS * cost_cls + W_L1 * cost_l1 + W_GIOU * cost_giou
        qi, ti = linear_sum_assignment(cost)
        qcls[b, qi] = tc[ti]
        qbox[b, qi] = tb[ti]
    return qcls, qbox


def _giou_jnp(a, b):
    """Elementwise GIoU for matched cxcywh pairs (..., 4)."""
    ax0, ay0 = a[..., 0] - a[..., 2] / 2, a[..., 1] - a[..., 3] / 2
    ax1, ay1 = a[..., 0] + a[..., 2] / 2, a[..., 1] + a[..., 3] / 2
    bx0, by0 = b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2
    bx1, by1 = b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2
    inter_w = jnp.clip(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0)
    inter_h = jnp.clip(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0)
    inter = inter_w * inter_h
    union = (
        (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    )
    iou = inter / jnp.maximum(union, 1e-9)
    hull_w = jnp.maximum(ax1, bx1) - jnp.minimum(ax0, bx0)
    hull_h = jnp.maximum(ay1, by1) - jnp.minimum(ay0, by0)
    hull = hull_w * hull_h
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def loss_fn(params, bstats, model, x_u8, qcls, qbox):
    """qcls/qbox: (L+1, B, Nq[, 4]) — decoder layers then enc head."""
    x = x_u8.astype(jnp.float32) / 255.0
    preds, new_bs = apply_mutable(model, params, bstats, x)
    logits = jnp.concatenate(
        [preds["aux_logits"], preds["enc_logits"][None]], axis=0
    ).astype(jnp.float32)  # (L+1, B, Nq, C)
    boxes = jnp.concatenate(
        [preds["aux_boxes"], preds["enc_boxes"][None]], axis=0
    ).astype(jnp.float32)

    pos = qcls >= 0
    n_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)
    onehot = jax.nn.one_hot(jnp.clip(qcls, 0), NUM_CLASSES) * pos[..., None]
    p = jax.nn.sigmoid(logits)
    ce = -(
        onehot * jnp.log(jnp.clip(p, 1e-8))
        + (1 - onehot) * jnp.log(jnp.clip(1 - p, 1e-8))
    )
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = FOCAL_ALPHA * onehot + (1 - FOCAL_ALPHA) * (1 - onehot)
    focal = (alpha_t * (1 - p_t) ** FOCAL_GAMMA * ce).sum() / n_pos

    l1 = (jnp.abs(boxes - qbox).sum(-1) * pos).sum() / n_pos
    giou = ((1.0 - _giou_jnp(boxes, qbox)) * pos).sum() / n_pos
    return W_CLS * focal + W_L1 * l1 + W_GIOU * giou, new_bs


def train(steps: int = 12000, out_path=None, pool_pages: int = 768,
          batch: int = 8, lr: float = 2.5e-4, seed: int = 0,
          variables=None, log_every: int = 100):
    model = make_model(aux=True)
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(seed), np.zeros((1, SIZE, SIZE, 3), np.float32)
        )
    params, bstats = split_vars(variables)
    tx = optax.chain(
        optax.clip_by_global_norm(0.5),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, lr, min(500, max(1, steps // 10)), steps
            ),
            weight_decay=1e-4,
        ),
    )
    opt_state = tx.init(params)

    @jax.jit
    def fwd(params, bstats, x_u8):
        # matching pass: batch-stat BN like the grad pass, but running
        # stats update only once per step (in loss_fn)
        x = x_u8.astype(jnp.float32) / 255.0
        preds, _ = apply_mutable(model, params, bstats, x)
        return {
            "logits": jnp.concatenate(
                [preds["aux_logits"], preds["enc_logits"][None]], axis=0
            ).astype(jnp.float32),
            "boxes": jnp.concatenate(
                [preds["aux_boxes"], preds["enc_boxes"][None]], axis=0
            ).astype(jnp.float32),
        }

    @jax.jit
    def step(params, bstats, opt_state, x_u8, qcls, qbox):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats, model, x_u8, qcls, qbox
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    logger.info("rendering %d labeled pages", pool_pages)
    imgs, tcls, tbox = make_pool(pool_pages, seed)
    nrng = np.random.default_rng(seed)
    n_layers = DEMO_ARCH["dec_layers"] + 1
    tic = time.perf_counter()
    with bn_training():
        for i in range(steps):
            idx = nrng.integers(0, pool_pages, batch)
            xd = jax.device_put(imgs[idx])
            preds = fwd(params, bstats, xd)
            logits = np.asarray(preds["logits"])
            boxes = np.asarray(preds["boxes"])
            qcls = np.zeros((n_layers, batch, logits.shape[2]), np.int32)
            qbox = np.zeros((n_layers, batch, logits.shape[2], 4), np.float32)
            for l in range(n_layers):
                qcls[l], qbox[l] = match_batch(
                    logits[l], boxes[l], tcls[idx], tbox[idx]
                )
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, xd, qcls, qbox
            )
            if i % 20 == 0:
                loss.block_until_ready()
            if i % log_every == 0 or i == steps - 1:
                logger.info(
                    "step %d loss %.4f (%.1fs)", i, float(loss),
                    time.perf_counter() - tic,
                )
            if out_path is not None and i and i % 2000 == 0:
                # crash-safe periodic save
                save_demo(join_vars(params, bstats), out_path)
    variables = join_vars(params, bstats)
    if out_path is not None:
        save_demo(variables, out_path)
    return variables


def save_demo(variables, out_path) -> None:
    import json
    from pathlib import Path

    from ..models.registry import save_variables

    out_path = Path(out_path)
    save_variables(variables, out_path, half=True)
    cfg = dict(DEMO_ARCH)
    cfg["conf_threshold"] = 0.4
    out_path.with_suffix(".json").write_text(json.dumps(cfg))
    logger.info("layout weights -> %s (+ .json arch config)", out_path)


def evaluate(variables=None, n_pages: int = 12, seed: int = 9999,
             conf: float = 0.4, iou_thresh: float = 0.5):
    """Detection quality on held-out pages through the production
    LayoutDetector postprocess: {recall, precision, cls_acc}."""
    from ..models.layout.engine import LayoutConfig, LayoutDetector

    det = LayoutDetector(
        variables,
        config=LayoutConfig(
            model_size=DEMO_ARCH["model_size"],
            input_size=DEMO_ARCH["input_size"],
            num_queries=DEMO_ARCH["num_queries"],
            dec_layers=DEMO_ARCH["dec_layers"],
            with_masks=DEMO_ARCH["with_masks"],
            conf_threshold=conf,
        ),
    )
    rng = random.Random(seed)
    hit = total = n_pred = cls_hit = 0
    from ..models.layout.engine import DOCLAYOUT_V2_LABELS

    for _ in range(n_pages):
        aspect = rng.choice(ASPECTS)
        img, gt = render_layout_page(rng, SIZE, height=int(SIZE * aspect))
        dets = det.batch_predict([img])[0]
        n_pred += len(dets)
        pred = np.array(
            [
                [d["poly"][0], d["poly"][1], d["poly"][4], d["poly"][5]]
                for d in dets
            ],
            np.float32,
        ).reshape(-1, 4)
        labels = [d["original_label"] for d in dets]
        for cid, x0, y0, x1, y1 in gt:
            total += 1
            if len(pred) == 0:
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
            ious = inter / np.maximum(union, 1e-9)
            j = int(np.argmax(ious))
            if ious[j] >= iou_thresh:
                hit += 1
                if labels[j] == DOCLAYOUT_V2_LABELS[cid]:
                    cls_hit += 1
    return {
        "recall": hit / max(total, 1),
        "precision": hit / max(n_pred, 1),
        "cls_acc": cls_hit / max(hit, 1),
    }


def tune_conf(variables, confs=(0.25, 0.3, 0.35, 0.4, 0.5),
              n_pages: int = 8):
    """Pick the confidence threshold maximizing recall*precision on
    held-out pages; returns (best_conf, {conf: metrics})."""
    results = {}
    for c in confs:
        results[c] = evaluate(variables, n_pages=n_pages, conf=c)
    best = max(
        results, key=lambda c: results[c]["recall"] * results[c]["precision"]
    )
    return best, results


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    out = sys.argv[2] if len(sys.argv) > 2 else None
    v = train(steps, out)
    logger.info("eval: %s", evaluate(v))
