"""UNITABLE wireless-table recognizer: ViT encoder + GPT-style AR decoder.

Architecture matches the published UNITABLE checkpoints exactly (reference:
rapid_doc/model/table/rapid_table_self/table_structure/unitable/
unitable_modules.py — Encoder :418 (16px linear patch backbone, learned
positions, 12x prenorm transformer d768/h12/ffn3072, final norm) and
GPTFastDecoder :667 (4 prenorm blocks with fused-QKV cached self-attn,
cross-attn over encoder memory, generator head, vocab 960); main.py:85-101
loop_decode with token white-list + bbox-run grammar forcing).

TPU-native decode: the whole crop batch decodes together under one
lax.while_loop with a preallocated KV cache, white-list logit masking and
bbox-grammar forcing in-graph (the reference decodes per table with
python-loop stepping); cross-attention K/V precompute once per sequence.
"""
from __future__ import annotations

from dataclasses import dataclass

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import TransformerBlock
from ..formula.decoder import CrossAttention, MemoryProjector

IMG_SIZE = 448
PATCH = 16
MAX_SEQ_LEN = 1024
N_BBOX_BINS = IMG_SIZE + 1

# published preprocessing stats (reference: unitable/pre_process.py:24-26)
UNITABLE_MEAN = np.array([0.86597056, 0.88463002, 0.87491087], np.float32)
UNITABLE_STD = np.array([0.20686628, 0.18201602, 0.18485524], np.float32)

# published vocab layout, reconstructed from the checkpoint constants
# (reference: unitable_modules.py TOKEN_WHITE_LIST = {1} + [12..509],
# consts.py HTML_BBOX_HTML_TOKENS order, eos=1 pad=2 prefix [html+bbox]=11)
HTML_TOKENS = [
    "<td></td>", "<td>[", "]</td>", "<td", ">[", "></td>",
    "<tr>", "</tr>", "<tbody>", "</tbody>", "<thead>", "</thead>",
    *[f' rowspan="{i}"' for i in range(2, 20)],
    *[f' colspan="{i}"' for i in range(2, 20)],
    ' colspan="25"',
]
EOS_ID = 1
PAD_ID = 2
PREFIX_ID = 11  # "[html+bbox]"
HTML_BASE = 12
BBOX_BASE = HTML_BASE + len(HTML_TOKENS)  # 61
VOCAB_SIZE = 960
BBOX_CLOSE_ID = HTML_BASE + HTML_TOKENS.index("]</td>")


class TableVocab:
    """id <-> token map; loads the published vocab.json when available."""

    def __init__(self, vocab_path=None) -> None:
        self.id_to_token: dict[int, str] = {EOS_ID: "<eos>", PAD_ID: "<pad>",
                                            PREFIX_ID: "[html+bbox]"}
        for i, tok in enumerate(HTML_TOKENS):
            self.id_to_token[HTML_BASE + i] = tok
        for i in range(N_BBOX_BINS):
            self.id_to_token[BBOX_BASE + i] = f"bbox-{i}"
        if vocab_path is not None:
            try:
                import json

                data = json.loads(open(vocab_path, encoding="utf-8").read())
                if isinstance(data, dict):
                    if all(isinstance(v, int) for v in data.values()):
                        self.id_to_token = {v: k for k, v in data.items()}
                    else:
                        self.id_to_token = {
                            int(k): v for k, v in data.items()
                        }
            except Exception:
                pass

    def decode(self, ids: list[int]) -> list[str]:
        out = []
        for i in ids:
            tok = self.id_to_token.get(int(i), "")
            if tok == "<eos>":
                break
            if tok and not tok.startswith("[") and tok != "<pad>":
                out.append(tok)
        return out


def whitelist_mask() -> np.ndarray:
    """(vocab,) additive mask: 0 on allowed ids, -1e9 elsewhere
    (reference: GPTFastDecoder.forward black-list fill)."""
    mask = np.full((VOCAB_SIZE,), -1e9, np.float32)
    mask[EOS_ID] = 0.0
    mask[HTML_BASE : BBOX_BASE + N_BBOX_BINS] = 0.0
    return mask


class UniTableEncoder(nn.Module):
    """Published encoder: conv patchify + learned pos + 12 prenorm blocks."""

    d_model: int = 768
    layers: int = 12
    heads: int = 12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.d_model, (PATCH, PATCH), strides=(PATCH, PATCH),
            padding="VALID", name="conv_proj",
        )(x)
        b, gh, gw, c = x.shape
        tokens = x.reshape(b, gh * gw, c)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (MAX_SEQ_LEN, self.d_model),
        )
        tokens = tokens + pos[None, : tokens.shape[1]].astype(tokens.dtype)
        for i in range(self.layers):
            tokens = TransformerBlock(
                self.d_model, self.heads, mlp_ratio=4.0, act="gelu",
                ln_eps=1e-5, name=f"block{i}",
            )(tokens)
        return nn.LayerNorm(epsilon=1e-5, name="norm", dtype=tokens.dtype)(
            tokens
        )


class GPTConfig:
    vocab_size = VOCAB_SIZE
    d_model = 768
    layers = 4
    heads = 12
    ffn = 3072
    max_positions = MAX_SEQ_LEN


@dataclass(frozen=True)
class UniTableDims:
    """Joint encoder+decoder dims. Defaults are the published checkpoint
    (12x768 encoder, 4x768 GPT decoder); the committed demo asset uses
    smaller dims, inferred back from its shapes by dims_from_variables.

    The instance doubles as the GPTFastDecoder cfg and the
    MemoryProjector cfg: both only read d_model/layers/heads/ffn/
    vocab_size/max_positions, exposed as properties over the decoder
    dims. Head dim is pinned at 64 (published 768/12)."""

    enc_d: int = 768
    enc_layers: int = 12
    dec_d: int = 768
    dec_layers: int = 4
    dec_ffn: int = 3072
    head_dim: int = 64
    vocab_size: int = VOCAB_SIZE
    max_positions: int = MAX_SEQ_LEN

    @property
    def enc_heads(self) -> int:
        return self.enc_d // self.head_dim

    @property
    def d_model(self) -> int:
        return self.dec_d

    @property
    def layers(self) -> int:
        return self.dec_layers

    @property
    def heads(self) -> int:
        return self.dec_d // self.head_dim

    @property
    def ffn(self) -> int:
        return self.dec_ffn


# demo-scale dims for the committed asset (~7M params, ~14MB fp16 —
# published size is ~120M/500MB, far too large for a repo asset)
DEMO_UNITABLE_DIMS = UniTableDims(
    enc_d=256, enc_layers=4, dec_d=256, dec_layers=2, dec_ffn=1024
)


def dims_from_variables(variables) -> UniTableDims:
    """Recover UniTableDims from a checkpoint's tree shapes."""
    enc_p = variables["encoder"]["params"]
    dec_p = variables["decoder"]["params"]
    return UniTableDims(
        enc_d=int(enc_p["conv_proj"]["kernel"].shape[-1]),
        enc_layers=sum(1 for k in enc_p if k.startswith("block")),
        dec_d=int(dec_p["token_embed"]["embedding"].shape[-1]),
        dec_layers=sum(1 for k in dec_p if k.startswith("layer")),
        dec_ffn=int(dec_p["layer0"]["linear1"]["kernel"].shape[-1]),
    )


class FusedCachedAttention(nn.Module):
    """Self-attention with fused QKV projection + external KV cache slot
    (reference: unitable_modules.py Attention :806 — wqkv/wo)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, cache_k, cache_v, position):
        B, T, C = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.heads, hd) * (hd**-0.5)
        k = k.reshape(B, T, self.heads, hd)
        v = v.reshape(B, T, self.heads, hd)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, position, 0, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, position, 0, 0)
        )
        S = cache_k.shape[1]
        attn = jnp.einsum("bthd,bshd->bhts", q, cache_k.astype(x.dtype))
        key_pos = jnp.arange(S)[None, None, None, :]
        query_pos = position + jnp.arange(T)[None, None, :, None]
        attn = jnp.where(key_pos <= query_pos, attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, cache_v.astype(x.dtype))
        return (
            nn.Dense(self.dim, name="wo")(out.reshape(B, T, C)),
            cache_k,
            cache_v,
        )


class GPTFastDecoder(nn.Module):
    """Published UNITABLE decoder (reference: unitable_modules.py:667-755).

    Same cached-step interface as the formula MBartDecoder so the decode
    loop machinery is shared. Differences from MBart: no embed scaling, no
    layernorm_embedding, no final layer_norm, positions without offset,
    fused QKV, biased generator head.
    """

    cfg: type[GPTConfig] = GPTConfig

    @nn.compact
    def __call__(self, tokens, caches_k, caches_v, position, mem_k_layers,
                 mem_v_layers, mem_mask):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.d_model, name="token_embed")(tokens)
        pos_table = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (c.max_positions, c.d_model),
        )
        T = tokens.shape[1]
        pos = jax.lax.dynamic_slice_in_dim(pos_table, position, T, axis=0)
        x = x + pos[None].astype(x.dtype)
        new_k, new_v = [], []
        for i in range(c.layers):
            x, ck, cv = GPTFastBlock(c, name=f"layer{i}")(
                x, caches_k[i], caches_v[i], position,
                mem_k_layers[i], mem_v_layers[i], mem_mask,
            )
            new_k.append(ck)
            new_v.append(cv)
        logits = nn.Dense(c.vocab_size, name="generator")(x)
        return logits, jnp.stack(new_k), jnp.stack(new_v)


class GPTFastBlock(nn.Module):
    cfg: type[GPTConfig]

    @nn.compact
    def __call__(self, x, cache_k, cache_v, position, mem_k, mem_v, mem_mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=x.dtype)(x)
        h, cache_k, cache_v = FusedCachedAttention(
            c.d_model, c.heads, name="self_attn"
        )(h, cache_k, cache_v, position)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=x.dtype)(x)
        h = CrossAttention(c.d_model, c.heads, name="cross_attn")(
            h, mem_k, mem_v, mem_mask
        )
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm3", dtype=x.dtype)(x)
        h = nn.Dense(c.ffn, name="linear1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.d_model, name="linear2")(h)
        return x + h, cache_k, cache_v


class GPTMemoryCfg:
    """MemoryProjector config shim: cross-attn K/V dims of the decoder."""

    d_model = GPTConfig.d_model
    heads = GPTConfig.heads
    layers = GPTConfig.layers


def unitable_decode(
    decoder: GPTFastDecoder,
    dec_vars,
    mem_proj: MemoryProjector,
    mem_vars,
    memory: jax.Array,
    max_len: int,
    dtype=jnp.bfloat16,
):
    """Batched greedy decode with white-list masking and bbox-grammar
    forcing under lax.while_loop (reference: main.py:85-101 loop_decode —
    a 5th consecutive bbox token is replaced by ']</td>')."""
    cfg = decoder.cfg
    B = memory.shape[0]
    hd = cfg.d_model // cfg.heads
    mem_k, mem_v = mem_proj.apply(mem_vars, memory)
    mem_mask = jnp.ones(memory.shape[:2], bool)
    wl = jnp.asarray(whitelist_mask())

    caches_k = jnp.zeros((cfg.layers, B, max_len, cfg.heads, hd), dtype)
    caches_v = jnp.zeros_like(caches_k)
    tokens = jnp.full((B, max_len), PAD_ID, jnp.int32)
    cur = jnp.full((B, 1), PREFIX_ID, jnp.int32)
    done = jnp.zeros((B,), jnp.bool_)
    lengths = jnp.zeros((B,), jnp.int32)
    bbox_run = jnp.zeros((B,), jnp.int32)

    def cond(state):
        step = state[0]
        return (step < max_len) & ~jnp.all(state[5])

    def body(state):
        step, cur, tokens, ck, cv, done, lengths, bbox_run = state
        logits, ck, cv = decoder.apply(
            dec_vars, cur, ck, cv, step, mem_k, mem_v, mem_mask
        )
        scores = logits[:, -1].astype(jnp.float32) + wl[None]
        nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        is_bbox = (nxt >= BBOX_BASE) & (nxt < BBOX_BASE + N_BBOX_BINS)
        bbox_run = jnp.where(is_bbox, bbox_run + 1, 0)
        force_close = bbox_run > 4
        nxt = jnp.where(force_close, BBOX_CLOSE_ID, nxt)
        bbox_run = jnp.where(force_close, 0, bbox_run)
        nxt = jnp.where(done, PAD_ID, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
        lengths = jnp.where(done, lengths, step + 1)
        done = done | (nxt == EOS_ID)
        return step + 1, nxt[:, None], tokens, ck, cv, done, lengths, bbox_run

    state = (0, cur, tokens, caches_k, caches_v, done, lengths, bbox_run)
    out = jax.lax.while_loop(cond, body, state)
    return out[2], out[6]


@dataclass
class UniTableConfig:
    max_len: int = MAX_SEQ_LEN


class UniTableStructure:
    def __init__(self, variables=None, config: UniTableConfig | None = None,
                 seed: int = 0, dims: UniTableDims | None = None):
        self.config = config or UniTableConfig()
        if dims is None:
            dims = (dims_from_variables(variables) if variables is not None
                    else UniTableDims())
        self.dims = dims
        self.encoder = UniTableEncoder(
            d_model=dims.enc_d, layers=dims.enc_layers, heads=dims.enc_heads
        )
        self.decoder = GPTFastDecoder(cfg=dims)
        self.mem_proj = MemoryProjector(dims)
        self.vocab = TableVocab(self._vocab_path())
        if variables is None:
            rng = jax.random.PRNGKey(seed)
            hd = dims.head_dim
            S = (IMG_SIZE // PATCH) ** 2
            x = np.zeros((1, IMG_SIZE, IMG_SIZE, 3), np.float32)
            enc_vars = self.encoder.init(rng, x)
            mem = np.zeros((1, S, dims.d_model), np.float32)
            mem_vars = self.mem_proj.init(rng, mem)
            dec_vars = self.decoder.init(
                rng, np.zeros((1, 1), np.int32),
                np.zeros((dims.layers, 1, 8, dims.heads, hd), np.float32),
                np.zeros((dims.layers, 1, 8, dims.heads, hd), np.float32),
                0,
                np.zeros((dims.layers, 1, S, dims.heads, hd), np.float32),
                np.zeros((dims.layers, 1, S, dims.heads, hd), np.float32),
                np.ones((1, S), bool),
            )
            variables = {"encoder": enc_vars, "decoder": dec_vars,
                         "mem_proj": mem_vars}
        from ...engine.session import commit_params

        self.variables = commit_params(variables)
        # decoder weight census for AR FLOPs/HBM accounting
        # (engine/flops.py track_ar_extra)
        dec_leaves = jax.tree.leaves(self.variables["decoder"])
        self._dec_params = float(sum(x.size for x in dec_leaves))
        self._dec_param_bytes = float(
            sum(x.size * x.dtype.itemsize for x in dec_leaves)
        )
        self._fn: dict = {}

    @staticmethod
    def _vocab_path():
        from ...config import get_models_dir

        p = get_models_dir() / "unitable_vocab.json"
        return p if p.is_file() else None

    def _compiled(self, max_len: int):
        fn = self._fn.get(max_len)
        if fn is None:
            def run(enc_vars, dec_vars, mem_vars, images):
                x = images.astype(jnp.float32) / 255.0
                x = (x - UNITABLE_MEAN) / UNITABLE_STD
                # bf16 memory: the per-step cross-attn K/V reads dominate
                memory = self.encoder.apply(enc_vars, x.astype(jnp.bfloat16))
                return unitable_decode(
                    self.decoder, dec_vars, self.mem_proj, mem_vars, memory,
                    max_len,
                )

            fn = jax.jit(run)
            self._fn[max_len] = fn
        return fn

    def __call__(
        self, imgs: list[np.ndarray], max_len: int = 256
    ) -> list[tuple[list[str], list[list[float]]]]:
        """Returns per-table (structure_tokens, cell bboxes in source px)."""
        if not imgs:
            return []
        from ...engine.buckets import batch_chunks, pad_rows

        all_imgs = np.stack(
            [cv2.resize(im, (IMG_SIZE, IMG_SIZE)) for im in imgs]
        )  # uint8 HWC RGB; normalize happens on device
        fn = self._compiled(max_len)
        # batch dim padded to a closed bucket set (anti-recompile)
        parts = []
        from ...engine.flops import track, track_ar_extra

        for s, e, padded in batch_chunks(len(imgs), sizes=(4, 16)):
            batch = pad_rows(all_imgs[s:e], padded)
            track(
                "table_unitable", fn,
                (self.variables["encoder"], self.variables["decoder"],
                 self.variables["mem_proj"], batch),
                sig=(batch.shape, str(batch.dtype), max_len),
            )
            t, l = fn(
                self.variables["encoder"], self.variables["decoder"],
                self.variables["mem_proj"], jnp.asarray(batch),
            )
            t, l = np.asarray(t), np.asarray(l)
            track_ar_extra(
                "table_unitable", steps=float(l.max()),
                batch=int(t.shape[0]), dec_params=self._dec_params,
                dec_param_bytes=self._dec_param_bytes,
            )
            parts.append((t[: e - s], l[: e - s]))
        tokens = np.concatenate([p[0] for p in parts])
        lengths = np.concatenate([p[1] for p in parts])
        results = []
        for i, img in enumerate(imgs):
            toks = self.vocab.decode(tokens[i, : int(lengths[i])].tolist())
            structure, bboxes = self._parse(toks, img.shape[1], img.shape[0])
            results.append((structure, bboxes))
        return results

    def _parse(
        self, toks: list[str], src_w: int, src_h: int
    ) -> tuple[list[str], list[list[float]]]:
        """html+bbox token stream -> (canonical structure tokens, xyxy cell
        boxes in source pixels), mirroring reference decode_tokens
        (main.py:103-151): every td contributes exactly one bbox (zeros
        when the model omitted coordinates)."""
        structure: list[str] = []
        bboxes: list[list[float]] = []
        sx, sy = src_w / IMG_SIZE, src_h / IMG_SIZE
        pending: list[int] = []
        in_cell = False
        attrs: list[str] = []

        def close_cell():
            nonlocal pending, in_cell, attrs
            if not in_cell:
                return
            if attrs:
                structure.append("<td")
                structure.extend(attrs)
                structure.append(">")
                structure.append("</td>")
            else:
                structure.append("<td></td>")
            if len(pending) == 4:
                x0, y0, x1, y1 = pending
                bboxes.append(
                    [x0 * sx, y0 * sy, x1 * sx, y1 * sy]
                )
            else:
                bboxes.append([0.0, 0.0, 0.0, 0.0])
            pending = []
            attrs = []
            in_cell = False

        for tok in toks:
            if tok.startswith("bbox-"):
                if in_cell and len(pending) < 4:
                    pending.append(int(tok[5:]))
            elif tok in ("<td>[", ">["):
                in_cell = True
            elif tok in ("]</td>", "></td>"):
                close_cell()
            elif tok == "<td></td>":
                in_cell = True
                close_cell()
            elif tok == "<td":
                in_cell = True
            elif tok.startswith(" rowspan") or tok.startswith(" colspan"):
                attrs.append(tok)
            elif tok in ("<tr>", "</tr>", "<thead>", "</thead>", "<tbody>",
                         "</tbody>"):
                close_cell()
                structure.append(tok)
        close_cell() if in_cell else None
        return structure, bboxes
