"""PP-FormulaNet_plus in flax: PPHGNetV2-B6 encoder + MBart greedy decoder.

Architecture per reference spec (reference:
rapid_doc/model/formula/rapid_formula_self/networks/
pp_formulanet_arch_config.yaml — B6 backbone, decoder 6x512x2048 heads 16,
max_new_tokens 2560, encoder_hidden_size 2048;
backbones/rec_pphgnetv2.py:1587 PPHGNetV2_B6_Formula flattens the stage-4
feature map to a (B, H*W, 2048) sequence).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layout.hgnet import PPHGNetV2
from .decoder import MBartConfig, MBartDecoder, MemoryProjector


class FormulaEncoder(nn.Module):
    """Image -> (B, S, d_model) memory for the decoder."""

    backbone_size: str = "B6"
    decoder_width: int = 512
    # 3 = stride-32 stage4 (published PP-FormulaNet layout); the demo
    # checkpoint uses 2 (stride 16) for a 4x finer memory at its small
    # 96xW buckets.
    out_index: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = PPHGNetV2(
            self.backbone_size, out_indices=(self.out_index,), name="backbone"
        )(x)
        f = feats[-1]  # (B, H/s, W/s, C)
        b, h, w, c = f.shape
        memory = f.reshape(b, h * w, c)
        # enc_to_dec_proj (2048 -> decoder width)
        return nn.Dense(self.decoder_width, name="enc_to_dec_proj")(memory)


def build_formula_modules(
    max_len: int = 2560,
    vocab_size: int = 50000,
    layers: int = 6,
    d_model: int = 512,
    ffn: int = 2048,
    heads: int = 16,
    backbone_size: str = "B6",
    out_index: int = 3,
):
    cfg = MBartConfig(
        vocab_size=vocab_size, d_model=d_model, layers=layers, heads=heads,
        ffn=ffn, max_positions=max_len,
    )
    return (
        FormulaEncoder(backbone_size, d_model, out_index=out_index),
        MBartDecoder(cfg),
        MemoryProjector(cfg),
        cfg,
    )
