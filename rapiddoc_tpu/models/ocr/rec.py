"""SVTR/CTC text recognition (PP-OCRv6-small flavor) in flax.

Backbone PPLCNetV4(rec,small) -> LightSVTR neck (2 transformer blocks)
-> CTC linear head over the 18710-entry dictionary.
Architecture per reference spec (reference:
rapid_doc/model/ocr/ppocrv6_pytorch/modeling/necks/rnn.py
EncoderWithLightSVTR, heads/rec_multi_head.py MultiHead,
rapid_doc/resources/arch_config.yaml ch_PP-OCRv6_small_rec_infer).
Output: (B, T, num_classes) CTC logits; T = W/8 for H=48 inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common.layers import ConvBNAct, TransformerBlock
from .backbone import PPLCNetV4


class LightSVTRNeck(nn.Module):
    dims: int = 120
    depth: int = 2
    num_heads: int = 8
    mlp_ratio: float = 2.0
    local_kernel: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, 1, W', C)
        residual = ConvBNAct(self.dims, 1, act="silu", name="skip_conv")(x)
        h = ConvBNAct(self.dims, 1, act="silu", name="reduce_conv")(x)
        h = h + ConvBNAct(
            self.dims,
            (1, self.local_kernel),
            act="silu",
            groups=self.dims,
            name="local_conv",
        )(h)
        b, hh, ww, c = h.shape
        seq = h.reshape(b, hh * ww, c)
        for i in range(self.depth):
            seq = TransformerBlock(
                self.dims, self.num_heads, self.mlp_ratio, act="silu",
                name=f"block{i}",
            )(seq)
        seq = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=seq.dtype)(seq)
        h = seq.reshape(b, hh, ww, c)
        return h + residual


class SVTRRec(nn.Module):
    """CTC recognizer. Input (B, 48, W, 3) normalized, output (B, W/8, classes)."""

    num_classes: int = 18710
    model_size: str = "small"
    dims: int = 120
    depth: int = 2
    mlp_ratio: float = 2.0
    local_kernel: int = 7

    @nn.compact
    def __call__(
        self, x: jax.Array, features_only: bool = False
    ) -> jax.Array:
        feat = PPLCNetV4(det=False, model_size=self.model_size, name="backbone")(x)
        feat = LightSVTRNeck(
            self.dims, self.depth, mlp_ratio=self.mlp_ratio,
            local_kernel=self.local_kernel, name="neck",
        )(feat)
        b, h, w, c = feat.shape
        seq = feat.reshape(b, h * w, c)  # h == 1 after backbone pooling
        if features_only:
            # caller fuses the vocab projection + argmax in a pallas
            # kernel (ops/ctc_head.py) so the (B,T,18710) logits never
            # materialize in HBM
            return seq
        logits = nn.Dense(self.num_classes, name="head")(seq)
        return logits


def ctc_greedy_decode(logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side CTC greedy collapse prep: argmax ids + max probs.

    Returns (ids, probs), both (B, T). Dedup + blank removal is a cheap host
    loop on tiny int arrays (keeps the device program static-shaped).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(probs, axis=-1)
    top = jnp.max(probs, axis=-1)
    return ids, top
