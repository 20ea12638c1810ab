"""UNITABLE wireless-table recognizer: ViT encoder + causal AR decoder.

Role parity with the reference (reference:
rapid_doc/model/table/rapid_table_self/table_structure/unitable/
main.py:22-120 + unitable_modules.py — linear patch backbone, transformer
encoder, KV-cached token-by-token decoder over an html+bbox vocabulary
with bbox-grammar forcing). Reuses the formula stack's MBart decode
machinery (same KV-cached while_loop) with a table vocabulary.
"""
from __future__ import annotations

import re
from dataclasses import dataclass

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common.layers import TransformerBlock
from ..formula.decoder import (
    MBartConfig,
    MBartDecoder,
    MemoryProjector,
    greedy_decode,
)

IMG_SIZE = 448
PATCH = 16
MAX_SEQ_LEN = 1024
N_BBOX_BINS = IMG_SIZE + 1

STRUCT_TOKENS = [
    "<thead>", "</thead>", "<tbody>", "</tbody>", "<tr>", "</tr>",
    "<td></td>", "<td", ">", "</td>",
    ' rowspan="2"', ' rowspan="3"', ' rowspan="4"', ' rowspan="5"',
    ' rowspan="6"', ' rowspan="7"', ' rowspan="8"', ' rowspan="9"',
    ' rowspan="10"',
    ' colspan="2"', ' colspan="3"', ' colspan="4"', ' colspan="5"',
    ' colspan="6"', ' colspan="7"', ' colspan="8"', ' colspan="9"',
    ' colspan="10"',
    "[", "]</td>",
]
SPECIALS = ["<pad>", "<bos>", "<eos>", "[html+bbox]"]


class TableVocab:
    def __init__(self) -> None:
        self.tokens = SPECIALS + STRUCT_TOKENS + [
            f"bbox-{i}" for i in range(N_BBOX_BINS)
        ]
        self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        self.pad_id = self.token_to_id["<pad>"]
        self.bos_id = self.token_to_id["<bos>"]
        self.eos_id = self.token_to_id["<eos>"]

    def __len__(self) -> int:
        return len(self.tokens)

    def decode(self, ids: list[int]) -> list[str]:
        out = []
        for i in ids:
            if 0 <= i < len(self.tokens):
                tok = self.tokens[i]
                if tok == "<eos>":
                    break
                if tok not in ("<pad>", "<bos>", "[html+bbox]"):
                    out.append(tok)
        return out


class UniTableEncoder(nn.Module):
    dim: int = 256
    layers: int = 4
    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        gh, gw = h // PATCH, w // PATCH
        patches = x.reshape(b, gh, PATCH, gw, PATCH, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, gh * gw, PATCH * PATCH * c
        )
        tokens = nn.Dense(self.dim, name="patch_embed")(patches)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            ((IMG_SIZE // PATCH) ** 2, self.dim),
        )
        tokens = tokens + pos[None, : tokens.shape[1]].astype(tokens.dtype)
        for i in range(self.layers):
            tokens = TransformerBlock(
                self.dim, self.heads, mlp_ratio=4.0, act="gelu",
                name=f"block{i}",
            )(tokens)
        return nn.LayerNorm(name="norm", dtype=tokens.dtype)(tokens)


@dataclass
class UniTableConfig:
    dim: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    heads: int = 8
    max_len: int = MAX_SEQ_LEN


class UniTableStructure:
    def __init__(self, variables=None, config: UniTableConfig | None = None,
                 seed: int = 0):
        self.config = config or UniTableConfig()
        cfg = self.config
        self.vocab = TableVocab()
        self.encoder = UniTableEncoder(cfg.dim, cfg.enc_layers, cfg.heads)
        self.dec_cfg = MBartConfig(
            vocab_size=len(self.vocab), d_model=cfg.dim, layers=cfg.dec_layers,
            heads=cfg.heads, ffn=cfg.dim * 4, max_positions=cfg.max_len,
            pad_token_id=self.vocab.pad_id, bos_token_id=self.vocab.bos_id,
            eos_token_id=self.vocab.eos_id,
        )
        self.decoder = MBartDecoder(self.dec_cfg)
        self.mem_proj = MemoryProjector(self.dec_cfg)
        if variables is None:
            rng = jax.random.PRNGKey(seed)
            x = np.zeros((1, IMG_SIZE, IMG_SIZE, 3), np.float32)
            enc_vars = self.encoder.init(rng, x)
            hd = cfg.dim // cfg.heads
            S = (IMG_SIZE // PATCH) ** 2
            mem = np.zeros((1, S, cfg.dim), np.float32)
            mem_vars = self.mem_proj.init(rng, mem)
            dec_vars = self.decoder.init(
                rng, np.zeros((1, 1), np.int32),
                np.zeros((cfg.dec_layers, 1, 8, cfg.heads, hd), np.float32),
                np.zeros((cfg.dec_layers, 1, 8, cfg.heads, hd), np.float32),
                0,
                np.zeros((cfg.dec_layers, 1, S, cfg.heads, hd), np.float32),
                np.zeros((cfg.dec_layers, 1, S, cfg.heads, hd), np.float32),
                np.ones((1, S), bool),
            )
            variables = {"encoder": enc_vars, "decoder": dec_vars,
                         "mem_proj": mem_vars}
        self.variables = variables
        self._fn = None

    def _compiled(self, max_len: int):
        if self._fn is None:
            def run(enc_vars, dec_vars, mem_vars, images):
                x = (images.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
                memory = self.encoder.apply(enc_vars, x).astype(jnp.float32)
                mask = jnp.ones(memory.shape[:2], bool)
                return greedy_decode(
                    self.decoder, dec_vars, self.mem_proj, mem_vars, memory,
                    mask, max_len,
                )

            self._fn = jax.jit(run)
        return self._fn

    def __call__(
        self, imgs: list[np.ndarray], max_len: int = 256
    ) -> list[tuple[list[str], list[list[float]]]]:
        """Returns per-table (structure_tokens, cell_bboxes in source px)."""
        if not imgs:
            return []
        batch = np.stack(
            [cv2.resize(im, (IMG_SIZE, IMG_SIZE)) for im in imgs]
        )  # uint8; /255 happens on device
        fn = self._compiled(max_len)
        tokens, lengths = fn(
            self.variables["encoder"], self.variables["decoder"],
            self.variables["mem_proj"], jnp.asarray(batch),
        )
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        results = []
        for i, img in enumerate(imgs):
            ids = tokens[i, : int(lengths[i])].tolist()
            toks = self.vocab.decode(ids)
            structure, bboxes = self._parse(toks, img.shape[1], img.shape[0])
            results.append((structure, bboxes))
        return results

    def _parse(
        self, toks: list[str], src_w: int, src_h: int
    ) -> tuple[list[str], list[list[float]]]:
        """Split the html+bbox stream into structure tokens and cell boxes."""
        structure: list[str] = []
        bboxes: list[list[float]] = []
        pending: list[int] = []
        sx, sy = src_w / IMG_SIZE, src_h / IMG_SIZE
        for tok in toks:
            if tok.startswith("bbox-"):
                pending.append(int(tok[5:]))
                if len(pending) == 4:
                    x0, y0, x1, y1 = pending
                    bboxes.append([x0 * sx, y0 * sy, x1 * sx, y1 * sy])
                    pending = []
            elif tok in ("[", "]</td>"):
                if tok == "]</td>":
                    structure.append("</td>")
                continue
            else:
                structure.append(tok)
        return structure, bboxes
