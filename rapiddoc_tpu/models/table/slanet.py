"""SLANet_plus wireless-table recognizer: LCNet CNN + GRU-attention AR head.

Role parity with the reference's default wireless structure model
(reference: rapid_doc/model/table/rapid_table_self/table_structure/
pp_structure/{main,pre_process,post_process}.py — 488x488 ImageNet-norm
padded input; the ONNX graph embeds a GRU step-decoder that emits one
structure token + one 8-coord cell box per step; TableLabelDecode maps
argmax ids through the structure dict and rescales boxes).

TPU-native design: the step decoder is a `lax.while_loop` over a static
max-step bucket with per-sample done-masking and early exit — one
compiled program for any table, no recompiles across structure lengths.
Backbone is an LCNet-style depthwise-separable CNN fused with a small
top-down PAN; the head attends over the stride-32 feature map (~256
positions at 488px), so each decode step is a handful of small matmuls
that XLA keeps resident on-chip.
"""
from __future__ import annotations

from dataclasses import dataclass

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import ConvBNAct, SqueezeExcite, upsample_nearest

IMG_SIZE = 488
MAX_STEPS = 512
LOC_REG = 8  # SLANet_plus regresses 4-point (8-coord) cell boxes

# Closed structure vocabulary (reference: table_structure_dict — merged
# no-span form per TableLabelDecode merge_no_span_structure, post_process.py).
STRUCT_TOKENS = [
    "<thead>", "</thead>", "<tbody>", "</tbody>", "<tr>", "</tr>",
    "<td></td>", "<td", ">", "</td>",
    ' rowspan="2"', ' rowspan="3"', ' rowspan="4"', ' rowspan="5"',
    ' rowspan="6"', ' rowspan="7"', ' rowspan="8"', ' rowspan="9"',
    ' rowspan="10"', ' rowspan="11"', ' rowspan="12"', ' rowspan="13"',
    ' rowspan="14"', ' rowspan="15"', ' rowspan="16"', ' rowspan="17"',
    ' rowspan="18"', ' rowspan="19"', ' rowspan="20"',
    ' colspan="2"', ' colspan="3"', ' colspan="4"', ' colspan="5"',
    ' colspan="6"', ' colspan="7"', ' colspan="8"', ' colspan="9"',
    ' colspan="10"', ' colspan="11"', ' colspan="12"', ' colspan="13"',
    ' colspan="14"', ' colspan="15"', ' colspan="16"', ' colspan="17"',
    ' colspan="18"', ' colspan="19"', ' colspan="20"',
]
TD_TOKENS = ("<td></td>", "<td")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SLANetVocab:
    def __init__(self) -> None:
        self.tokens = ["sos"] + STRUCT_TOKENS + ["eos"]
        self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        self.sos_id = 0
        self.eos_id = len(self.tokens) - 1

    def __len__(self) -> int:
        return len(self.tokens)


class LCNetBlock(nn.Module):
    """Depthwise-separable block (dw 3x3/5x5 + pw 1x1, hardswish, opt SE)."""

    out_ch: int
    stride: int = 1
    kernel: int = 3
    use_se: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ConvBNAct(
            x.shape[-1], self.kernel, self.stride, groups=x.shape[-1],
            act="hardswish", name="dw",
        )(x)
        if self.use_se:
            x = SqueezeExcite(x.shape[-1], name="se")(x)
        return ConvBNAct(self.out_ch, 1, 1, act="hardswish", name="pw")(x)


class SLANetBackbone(nn.Module):
    """LCNet-style backbone: stride-4..32 pyramid (C2..C5)."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        c = lambda n: max(16, int(n * self.scale) // 8 * 8)
        x = ConvBNAct(c(16), 3, 2, act="hardswish", name="stem")(x)
        x = LCNetBlock(c(32), 1, name="b1")(x)
        x = LCNetBlock(c(64), 2, name="b2a")(x)
        x = LCNetBlock(c(64), 1, name="b2b")(x)
        c2 = x  # stride 4
        x = LCNetBlock(c(128), 2, name="b3a")(x)
        x = LCNetBlock(c(128), 1, name="b3b")(x)
        c3 = x  # stride 8
        x = LCNetBlock(c(256), 2, kernel=5, name="b4a")(x)
        for i in range(4):
            x = LCNetBlock(c(256), 1, kernel=5, name=f"b4{'bcde'[i]}")(x)
        c4 = x  # stride 16
        x = LCNetBlock(c(512), 2, kernel=5, use_se=True, name="b5a")(x)
        x = LCNetBlock(c(512), 1, kernel=5, use_se=True, name="b5b")(x)
        c5 = x  # stride 32
        return [c2, c3, c4, c5]


class PANNeck(nn.Module):
    """Reduce pyramid to `out_ch`, top-down fuse, return the map at
    `out_level` (index into the C2..C5 pyramid).

    out_level=2 (stride 16, ~31x31 at 488px) is the decode-attention
    default: span extents are 1-2 positions wide at stride 32, too coarse
    for the head to count crossed boundaries — measured seq_acc 0.54 at
    stride 32 vs the span-dominated error profile."""

    out_ch: int = 96
    out_level: int = 2

    @nn.compact
    def __call__(self, feats: list[jax.Array]) -> jax.Array:
        reduced = [
            ConvBNAct(self.out_ch, 1, 1, act="hardswish", name=f"reduce{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down accumulation into progressively finer maps, then one
        # bottom-up strided conv chain so the output level is globally
        # informed from both directions.
        for i in range(len(reduced) - 1, 0, -1):
            up = upsample_nearest(reduced[i], 2)
            up = up[:, : reduced[i - 1].shape[1], : reduced[i - 1].shape[2]]
            reduced[i - 1] = reduced[i - 1] + up
        x = reduced[0]
        out = reduced[0]
        for i in range(1, len(reduced)):
            x = ConvBNAct(
                self.out_ch, 3, 2, act="hardswish", name=f"down{i}"
            )(x)
            x = x[:, : reduced[i].shape[1], : reduced[i].shape[2]]
            x = x + reduced[i]
            if i == self.out_level:
                out = x
        return ConvBNAct(self.out_ch, 3, 1, act="hardswish", name="out")(out)


class SLAHeadStep(nn.Module):
    """One GRU-attention decode step (applied inside lax.while_loop)."""

    vocab_size: int
    hidden: int = 256

    @nn.compact
    def __call__(self, hidden_state, prev_tok, fea, fea_key):
        """hidden_state (B,H); prev_tok (B,); fea (B,S,C); fea_key (B,S,H)
        precomputed projection of fea. Returns (new_hidden, logits, loc)."""
        score = nn.Dense(1, name="attn_score")(
            jnp.tanh(fea_key + nn.Dense(
                self.hidden, use_bias=False, name="attn_hidden"
            )(hidden_state)[:, None])
        )
        alpha = jax.nn.softmax(score.astype(jnp.float32), axis=1).astype(
            fea.dtype
        )
        context = jnp.sum(alpha * fea, axis=1)  # (B, C)
        emb = nn.Embed(self.vocab_size, self.hidden, name="emb")(prev_tok)
        x = jnp.concatenate([context.astype(emb.dtype), emb], axis=-1)
        new_h = nn.GRUCell(features=self.hidden, name="gru")(hidden_state, x)[0]
        logits = nn.Dense(self.vocab_size, name="struct_fc2")(
            jax.nn.relu(nn.Dense(self.hidden, name="struct_fc1")(new_h))
        )
        loc_in = jnp.concatenate([new_h, context.astype(new_h.dtype)], axis=-1)
        loc = jax.nn.sigmoid(
            nn.Dense(LOC_REG, name="loc_fc2")(
                jax.nn.relu(nn.Dense(self.hidden, name="loc_fc1")(loc_in))
            ).astype(jnp.float32)
        )
        return new_h, logits, loc


class FeaKey(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, fea):
        return nn.Dense(self.hidden, name="proj")(fea)


def sla_decode(
    step: SLAHeadStep,
    step_vars,
    fea_key_mod: FeaKey,
    fea_key_vars,
    fea: jax.Array,
    sos_id: int,
    eos_id: int,
    max_steps: int,
):
    """AR structure decode: returns (token_ids (B,T), locs (B,T,8),
    lengths (B,)). Early-exits when every table has emitted eos."""
    B = fea.shape[0]
    fea_key = fea_key_mod.apply(fea_key_vars, fea)
    hidden = jnp.zeros((B, step.hidden), fea.dtype)
    tokens = jnp.full((B, max_steps), eos_id, jnp.int32)
    locs = jnp.zeros((B, max_steps, LOC_REG), jnp.float32)
    cur = jnp.full((B,), sos_id, jnp.int32)
    done = jnp.zeros((B,), jnp.bool_)
    lengths = jnp.zeros((B,), jnp.int32)

    def cond(state):
        i, _, _, _, _, done, _ = state
        return (i < max_steps) & ~jnp.all(done)

    def body(state):
        i, hidden, cur, tokens, locs, done, lengths = state
        hidden, logits, loc = step.apply(step_vars, hidden, cur, fea, fea_key)
        nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        locs = jax.lax.dynamic_update_slice(
            locs, jnp.where(done[:, None], 0.0, loc)[:, None], (0, i, 0)
        )
        lengths = jnp.where(done, lengths, i + 1)
        done = done | (nxt == eos_id)
        return i + 1, hidden, nxt, tokens, locs, done, lengths

    state = (0, hidden, cur, tokens, locs, done, lengths)
    _, _, _, tokens, locs, _, lengths = jax.lax.while_loop(cond, body, state)
    return tokens, locs, lengths


@dataclass
class SLANetConfig:
    scale: float = 1.0
    neck_ch: int = 96
    hidden: int = 256
    max_steps: int = MAX_STEPS


class SLANetStructure:
    """488-fixed-shape SLANet_plus session; same call contract as
    UniTableStructure: imgs -> [(structure_tokens, cell_bboxes_px)]."""

    def __init__(self, variables=None, config: SLANetConfig | None = None,
                 seed: int = 0):
        self.config = config or SLANetConfig()
        cfg = self.config
        self.vocab = SLANetVocab()
        self.backbone = SLANetBackbone(cfg.scale)
        self.neck = PANNeck(cfg.neck_ch)
        self.step = SLAHeadStep(len(self.vocab), cfg.hidden)
        self.fea_key = FeaKey(cfg.hidden)
        if variables is None:
            rng = jax.random.PRNGKey(seed)
            x = np.zeros((1, IMG_SIZE, IMG_SIZE, 3), np.float32)
            bb_vars = self.backbone.init(rng, x)
            feats = self.backbone.apply(bb_vars, x)
            neck_vars = self.neck.init(rng, feats)
            fea_map = self.neck.apply(neck_vars, feats)
            S = fea_map.shape[1] * fea_map.shape[2]
            fea = np.zeros((1, S, cfg.neck_ch), np.float32)
            fk_vars = self.fea_key.init(rng, fea)
            step_vars = self.step.init(
                rng, np.zeros((1, cfg.hidden), np.float32),
                np.zeros((1,), np.int32), fea,
                np.zeros((1, S, cfg.hidden), np.float32),
            )
            variables = {"backbone": bb_vars, "neck": neck_vars,
                         "fea_key": fk_vars, "step": step_vars}
        # device-resident bf16 weights (engine/session.py commit_params)
        from ...engine.session import commit_params

        self.variables = commit_params(variables)
        # per-step weight census for AR FLOPs/HBM accounting
        # (engine/flops.py track_ar_extra)
        step_leaves = jax.tree.leaves(self.variables["step"])
        self._step_params = float(sum(x.size for x in step_leaves))
        self._step_param_bytes = float(
            sum(x.size * x.dtype.itemsize for x in step_leaves)
        )
        self._fn = None

    def _compiled(self):
        if self._fn is None:
            def run(bb_vars, neck_vars, fk_vars, step_vars, images):
                # uint8 in; ImageNet normalize on device
                x = images.astype(jnp.float32) / 255.0
                x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
                feats = self.backbone.apply(bb_vars, x.astype(jnp.bfloat16))
                fea_map = self.neck.apply(neck_vars, feats)
                b, h, w, c = fea_map.shape
                # stay in bf16 through the decode loop (softmax/argmax/loc
                # escapes to fp32 inside SLAHeadStep); fp32 here would
                # promote every step's matmuls off the fast path
                fea = fea_map.reshape(b, h * w, c)
                return sla_decode(
                    self.step, step_vars, self.fea_key, fk_vars, fea,
                    self.vocab.sos_id, self.vocab.eos_id,
                    self.config.max_steps,
                )

            self._fn = jax.jit(run)
        return self._fn

    def _preprocess(self, img: np.ndarray) -> np.ndarray:
        """uint8 padded canvas; normalization happens on device."""
        h, w = img.shape[:2]
        ratio = IMG_SIZE / max(h, w)
        rw, rh = max(1, int(w * ratio)), max(1, int(h * ratio))
        out = np.zeros((IMG_SIZE, IMG_SIZE, 3), np.uint8)
        out[:rh, :rw] = cv2.resize(img, (rw, rh))
        return out

    def __call__(
        self, imgs: list[np.ndarray], max_len: int | None = None
    ) -> list[tuple[list[str], list[list[float]]]]:
        if not imgs:
            return []
        from ...engine.buckets import batch_chunks, pad_rows

        all_imgs = np.stack([self._preprocess(im) for im in imgs])
        fn = self._compiled()
        # batch dim padded to a closed bucket set (anti-recompile)
        parts = []
        from ...engine.flops import track, track_ar_extra

        for s, e, padded in batch_chunks(len(imgs), sizes=(4, 16)):
            batch = pad_rows(all_imgs[s:e], padded)
            track(
                "table_slanet", fn,
                (self.variables["backbone"], self.variables["neck"],
                 self.variables["fea_key"], self.variables["step"], batch),
                sig=(batch.shape, str(batch.dtype)),
            )
            t, l, n = fn(
                self.variables["backbone"], self.variables["neck"],
                self.variables["fea_key"], self.variables["step"],
                jnp.asarray(batch),
            )
            t, l, n = np.asarray(t), np.asarray(l), np.asarray(n)
            track_ar_extra(
                "table_slanet", steps=float(n.max()),
                batch=int(t.shape[0]), dec_params=self._step_params,
                dec_param_bytes=self._step_param_bytes,
            )
            parts.append((t[: e - s], l[: e - s], n[: e - s]))
        tokens = np.concatenate([p[0] for p in parts])
        locs = np.concatenate([p[1] for p in parts])
        lengths = np.concatenate([p[2] for p in parts])
        results = []
        for i, img in enumerate(imgs):
            n = int(lengths[i])
            structure: list[str] = []
            bboxes: list[list[float]] = []
            h, w = img.shape[:2]
            # boxes are sigmoid-normalized to the un-padded resized region
            ratio = IMG_SIZE / max(h, w)
            sx = IMG_SIZE / ratio
            sy = IMG_SIZE / ratio
            for t in range(n):
                tok_id = int(tokens[i, t])
                if tok_id in (self.vocab.sos_id, self.vocab.eos_id):
                    continue
                tok = self.vocab.tokens[tok_id]
                structure.append(tok)
                if tok in TD_TOKENS:
                    quad = locs[i, t]
                    xs = quad[0::2] * sx
                    ys = quad[1::2] * sy
                    bboxes.append(
                        [float(xs.min()), float(ys.min()),
                         float(xs.max()), float(ys.max())]
                    )
            results.append((structure, bboxes))
        return results
