"""Demo trainer for UNITABLE (ViT encoder + GPT decoder, html+bbox stream).

Usage:
    python -m rapiddoc_tpu.train.unitable [steps] [out.npz]

Trains the PUBLISHED architecture (models/table/unitable.py — 12x768
encoder, 4x768 GPT decoder, vocab 960) on rapiddoc_tpu.train.synth_table
tables, whose HTML token stream + cell boxes are exact ground truth. The
synth stream is converted to the UNITABLE html+bbox grammar (reference:
rapid_doc/model/table/rapid_table_self/table_structure/unitable/
consts.py HTML_BBOX_HTML_TOKENS — each <td> carries 4 quantized bbox
tokens between '<td>['/']</td>' or '>['/'></td>'). The checkpoint loads
straight into UniTableStructure — same modules, no key maps.
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

from ..models.formula.decoder import MemoryProjector
from ..models.table.unitable import (
    BBOX_BASE,
    DEMO_UNITABLE_DIMS,
    EOS_ID,
    HTML_BASE,
    HTML_TOKENS,
    IMG_SIZE,
    N_BBOX_BINS,
    PAD_ID,
    PREFIX_ID,
    GPTFastDecoder,
    UniTableDims,
    UniTableEncoder,
    UNITABLE_MEAN,
    UNITABLE_STD,
)
from ..utils.logging import get_logger
from .synth_table import render_table

logger = get_logger("rapiddoc_tpu.train.unitable")

TRAIN_STEPS = 256  # token budget (== production default decode max_len)
_HTML_ID = {t: HTML_BASE + i for i, t in enumerate(HTML_TOKENS)}


def to_unitable_ids(
    tokens: list[str],
    cell_boxes: list[tuple[float, float, float, float]],
    src_w: int,
    src_h: int,
) -> list[int] | None:
    """Canonical structure tokens + per-<td> boxes -> html+bbox id stream
    (terminated with EOS). None when a token has no vocab id."""
    sx, sy = IMG_SIZE / src_w, IMG_SIZE / src_h

    def bbox_ids(box):
        x0, y0, x1, y1 = box
        vals = (x0 * sx, y0 * sy, x1 * sx, y1 * sy)
        return [
            BBOX_BASE + int(np.clip(round(v), 0, N_BBOX_BINS - 1))
            for v in vals
        ]

    ids: list[int] = []
    cell_i = 0
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == "<td></td>":
            ids.append(_HTML_ID["<td>["])
            ids += bbox_ids(cell_boxes[cell_i])
            ids.append(_HTML_ID["]</td>"])
            cell_i += 1
        elif t == "<td":
            ids.append(_HTML_ID["<td"])
            i += 1
            while i < len(tokens) and tokens[i] != ">":
                if tokens[i] not in _HTML_ID:
                    return None
                ids.append(_HTML_ID[tokens[i]])
                i += 1
            ids.append(_HTML_ID[">["])
            ids += bbox_ids(cell_boxes[cell_i])
            ids.append(_HTML_ID["></td>"])
            cell_i += 1
            i += 1  # skip the trailing "</td>"
        else:
            if t not in _HTML_ID:
                return None
            ids.append(_HTML_ID[t])
        i += 1
    ids.append(EOS_ID)
    return ids


def unitable_sample(rng: random.Random):
    """One teacher-forcing sample: (img uint8 (448,448,3), ids padded to
    TRAIN_STEPS with PAD, seq_len) or None when over budget."""
    s = render_table(rng, wired=rng.random() < 0.5)
    h, w = s.img.shape[:2]
    ids = to_unitable_ids(s.tokens, s.cell_boxes, w, h)
    if ids is None or len(ids) > TRAIN_STEPS:
        return None
    img = cv2.resize(s.img, (IMG_SIZE, IMG_SIZE))
    tok = np.full((TRAIN_STEPS,), PAD_ID, np.int32)
    tok[: len(ids)] = ids
    return img, tok, len(ids)


def make_pool(n: int, seed: int = 0):
    rng = random.Random(seed)
    imgs = np.zeros((n, IMG_SIZE, IMG_SIZE, 3), np.uint8)
    toks = np.zeros((n, TRAIN_STEPS), np.int32)
    lens = np.zeros((n,), np.int32)
    i = 0
    while i < n:
        s = unitable_sample(rng)
        if s is None:
            continue
        imgs[i], toks[i], lens[i] = s
        i += 1
    return imgs, toks, lens


def train_unitable(steps: int = 12000, out_path=None, pool_n: int = 3072,
                   batch: int = 8, lr: float = 2e-4, seed: int = 0,
                   variables=None, dims: UniTableDims | None = None):
    """Default dims are DEMO_UNITABLE_DIMS (~7M params — the committed
    asset must stay small); pass UniTableDims() to exercise the published
    12x768/4x768 architecture (recipe validated at that size too:
    same corpus, TF loss ~0.03 at 8k steps)."""
    init_warm = variables is not None
    if dims is None:
        if variables is not None:
            from ..models.table.unitable import dims_from_variables

            dims = dims_from_variables(variables)
        else:
            dims = DEMO_UNITABLE_DIMS
    cfg = dims
    encoder = UniTableEncoder(
        d_model=dims.enc_d, layers=dims.enc_layers, heads=dims.enc_heads
    )
    decoder = GPTFastDecoder(cfg=dims)
    mem_proj = MemoryProjector(dims)
    hd = cfg.d_model // cfg.heads
    S = (IMG_SIZE // 16) ** 2
    if variables is None:
        rng = jax.random.PRNGKey(seed)
        x0 = np.zeros((1, IMG_SIZE, IMG_SIZE, 3), np.float32)
        enc_vars = encoder.init(rng, x0)
        mem_vars = mem_proj.init(rng, np.zeros((1, S, cfg.d_model), np.float32))
        dec_vars = decoder.init(
            rng, np.zeros((1, 1), np.int32),
            np.zeros((cfg.layers, 1, 8, cfg.heads, hd), np.float32),
            np.zeros((cfg.layers, 1, 8, cfg.heads, hd), np.float32),
            0,
            np.zeros((cfg.layers, 1, S, cfg.heads, hd), np.float32),
            np.zeros((cfg.layers, 1, S, cfg.heads, hd), np.float32),
            np.ones((1, S), bool),
        )
        variables = {"encoder": enc_vars, "decoder": dec_vars,
                     "mem_proj": mem_vars}

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, lr, min(200, steps // 10), steps
        ), weight_decay=1e-4),
    )
    opt_state = tx.init(variables)

    def _decode_full(variables, prev, mem_k, mem_v, mem_mask):
        # teacher forcing == one full-width cached step at position 0:
        # FusedCachedAttention's (key_pos <= query_pos) mask is exactly
        # the causal mask when T == max_len
        B, T = prev.shape
        caches_k = jnp.zeros((cfg.layers, B, T, cfg.heads, hd), jnp.float32)
        caches_v = jnp.zeros_like(caches_k)
        logits, _, _ = decoder.apply(
            variables["decoder"], prev, caches_k, caches_v, 0,
            mem_k, mem_v, mem_mask,
        )
        return logits.astype(jnp.float32)

    def loss_fn(variables, x_u8, tok, lens, coins):
        x = x_u8.astype(jnp.float32) / 255.0
        x = (x - UNITABLE_MEAN) / UNITABLE_STD
        memory = encoder.apply(variables["encoder"], x)
        mem_k, mem_v = mem_proj.apply(variables["mem_proj"], memory)
        mem_mask = jnp.ones(memory.shape[:2], bool)
        B, T = tok.shape
        prev = jnp.concatenate(
            [jnp.full((B, 1), PREFIX_ID, jnp.int32), tok[:, :-1]], axis=1
        )
        # two-pass scheduled sampling (transformer variant of the SLANet
        # per-step coin flips, train/table.py:402): pass 1 teacher-forced
        # under stop_gradient yields the model's own argmax stream; where
        # coins is set, pass 2 sees that prediction as the previous token
        # instead of ground truth, so the greedy free-run distribution is
        # trained on — not just the gold prefix.
        logits1 = _decode_full(
            jax.lax.stop_gradient(variables), prev,
            jax.lax.stop_gradient(mem_k), jax.lax.stop_gradient(mem_v),
            mem_mask,
        )
        pred = jnp.argmax(logits1, axis=-1).astype(jnp.int32)
        model_prev = jnp.concatenate(
            [jnp.full((B, 1), PREFIX_ID, jnp.int32), pred[:, :-1]], axis=1
        )
        mixed = jnp.where(coins, model_prev, prev)
        logits = _decode_full(variables, mixed, mem_k, mem_v, mem_mask)
        mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
        is_bbox = (tok >= BBOX_BASE) & (tok < BBOX_BASE + N_BBOX_BINS)
        logp = jax.nn.log_softmax(logits, axis=-1)

        def _nll(ids):
            return -jnp.take_along_axis(logp, ids[..., None], axis=-1)[..., 0]

        ce_hard = _nll(tok)
        # bbox bins are ordinal: a +/-1-bin miss is visually lossless, so
        # smooth 15% of the target mass onto each neighbouring bin — the
        # head learns the geometry instead of over-penalised exact bins
        lo = jnp.maximum(tok - 1, BBOX_BASE)
        hi = jnp.minimum(tok + 1, BBOX_BASE + N_BBOX_BINS - 1)
        ce_bbox = 0.7 * ce_hard + 0.15 * _nll(lo) + 0.15 * _nll(hi)
        ce = jnp.where(is_bbox, ce_bbox, ce_hard)
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = (ce * mask).sum() / denom
        m_st = mask * (~is_bbox)
        m_bb = mask * is_bbox
        aux = (
            (ce_hard * m_st).sum() / jnp.maximum(m_st.sum(), 1.0),
            (ce_hard * m_bb).sum() / jnp.maximum(m_bb.sum(), 1.0),
        )
        return loss, aux

    @jax.jit
    def train_step(variables, opt_state, x, tok, lens, coins):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables, x, tok, lens, coins
        )
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, loss, aux

    logger.info("rendering %d unitable tables", pool_n)
    imgs, toks, lens = make_pool(pool_n, seed)

    # continuous pool refresh: a host thread re-renders random rows while
    # the chip trains. The ViT memorizes a FIXED pool (free-run is exact
    # on train tables, drifts on fresh ones); streaming fresh tables at
    # renderer speed bounds how often any table repeats.
    import threading

    pool_lock = threading.Lock()
    stop_refresh = threading.Event()
    refreshed = [0]

    def _refresh():
        rrng = random.Random(seed + 101)
        nidx = np.random.default_rng(seed + 202)
        while not stop_refresh.is_set():
            s = unitable_sample(rrng)
            if s is None:
                continue
            j = int(nidx.integers(0, pool_n))
            with pool_lock:
                imgs[j], toks[j], lens[j] = s
            refreshed[0] += 1

    refresher = threading.Thread(target=_refresh, daemon=True)
    refresher.start()

    warm_start = init_warm
    nrng = np.random.default_rng(seed)
    tic = time.perf_counter()
    for i in range(steps):
        idx = nrng.integers(0, pool_n, batch)
        # scheduled-sampling rate (mirrors train/table.py SLANet ramp):
        # fresh runs learn the grammar teacher-forced for a quarter then
        # ramp to 0.35; warm continues ramp over 1k steps
        if warm_start:
            p = min(0.35, 0.35 * i / 1000.0)
        else:
            p = 0.0 if i < steps // 4 else min(
                0.35, 0.35 * (i - steps // 4) / max(steps // 4, 1)
            )
        coins = nrng.random((batch, TRAIN_STEPS)) < p
        with pool_lock:
            bx, bt, bl = imgs[idx].copy(), toks[idx].copy(), lens[idx].copy()
        variables, opt_state, loss, aux = train_step(
            variables, opt_state, bx, bt, bl, coins
        )
        if i % 20 == 0:
            loss.block_until_ready()
        if i % 100 == 0 or i == steps - 1:
            logger.info(
                "unitable step %d loss %.4f (st %.4f bb %.4f) p_ss %.2f "
                "refreshed %d (%.1fs)",
                i, float(loss), float(aux[0]), float(aux[1]), p,
                refreshed[0], time.perf_counter() - tic)
        if out_path is not None and i and i % 1000 == 0:
            from ..models.registry import save_variables

            save_variables(variables, out_path, half=True)
    stop_refresh.set()
    if out_path is not None:
        from ..models.registry import save_variables

        save_variables(variables, out_path, half=True)
        logger.info("unitable weights -> %s", out_path)
    return variables


def eval_unitable(variables, n: int = 12, seed: int = 4444):
    """Exact structure-token rate + cell-box IoU through the production
    UniTableStructure path (decode grammar, white-list, _parse)."""
    from ..models.table.unitable import UniTableStructure
    from ..utils.teds import teds

    uni = UniTableStructure(variables)
    rng = random.Random(seed)
    seq_ok = 0
    ious = []
    teds_scores = []
    tried = 0
    while tried < n:
        s = render_table(rng, wired=rng.random() < 0.5)
        h, w = s.img.shape[:2]
        ids = to_unitable_ids(s.tokens, s.cell_boxes, w, h)
        if ids is None or len(ids) > TRAIN_STEPS:
            continue
        tried += 1
        (structure, bboxes), = uni([s.img])
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out = sys.argv[2] if len(sys.argv) > 2 else None
    init = None
    import os

    if out and os.path.isfile(out) and not os.environ.get(
        "RAPIDDOC_TRAIN_FRESH"
    ):
        from pathlib import Path

        from ..models.registry import _load_variables

        init = _load_variables(Path(out))
        if init is not None:
            logger.info("warm start from %s", out)
    # warm continues default to a FRESH pool seed — another tour of a
    # pool the model already fits teaches nothing about free-run drift
    seed = int(os.environ.get(
        "RAPIDDOC_TRAIN_SEED", "17" if init is not None else "0"
    ))
    v = train_unitable(steps, out, variables=init, seed=seed)
    logger.info("unitable eval: %s", eval_unitable(v))
