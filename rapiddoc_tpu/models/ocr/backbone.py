"""PPLCNetV4 backbone (det & rec variants) in flax.

Architecture per the reference spec (reference:
rapid_doc/model/ocr/ppocrv6_pytorch/modeling/backbones/rec_lcnetv4.py,
NET_CONFIG_DET/NET_CONFIG_REC): branch stem, then four stages of
depthwise-separable blocks with GELU channel mixing and optional SE.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common.layers import ConvBNAct, SqueezeExcite, act_fn

NET_CONFIG_DET = {
    "small": {
        "stem_channels": [3, 24, 48],
        "block_configs": [
            [[3, 48, 48, 1, True], [3, 48, 48, 1, False]],
            [[3, 48, 96, 2, False], [3, 96, 96, 1, True], [3, 96, 96, 1, False]],
            [
                [3, 96, 192, 2, False],
                [3, 192, 192, 1, True],
                [3, 192, 192, 1, False],
                [3, 192, 192, 1, True],
                [3, 192, 192, 1, False],
            ],
            [[3, 192, 384, 2, False], [3, 384, 384, 1, True], [3, 384, 384, 1, False]],
        ],
    },
}

NET_CONFIG_REC = {
    "small": {
        "stem_channels": [3, 48, 96],
        "block_configs": [
            [[3, 96, 96, 1, True]],
            [[3, 96, 96, 1, False], [3, 96, 96, 1, False]],
            [
                [3, 96, 192, (2, 1), False],
                [3, 192, 192, 1, True],
                [3, 192, 192, 1, False],
                [3, 192, 192, 1, True],
                [3, 192, 192, 1, False],
                [3, 192, 192, 1, True],
                [3, 192, 192, 1, False],
            ],
            [[3, 192, 384, (2, 1), False], [3, 384, 384, 1, True], [3, 384, 384, 1, False]],
        ],
    },
    "medium": {
        "stem_channels": [3, 64, 128],
        "block_configs": [
            [[3, 128, 128, 1, True]],
            [[3, 128, 256, 1, False], [3, 256, 256, 1, False], [3, 256, 256, 1, True]],
            [
                [3, 256, 512, (2, 1), False],
                [3, 512, 512, 1, True],
                [3, 512, 512, 1, False],
                [3, 512, 512, 1, True],
                [3, 512, 512, 1, False],
                [3, 512, 512, 1, True],
                [3, 512, 512, 1, False],
            ],
            [[3, 512, 768, (2, 1), False], [3, 768, 768, 1, True], [3, 768, 768, 1, False]],
        ],
    },
}


class LCNetV4Stem(nn.Module):
    """Branch stem: stem1 k3s2 -> {pool | stem2a/2b} concat -> stem3 k3s2 -> stem4 1x1."""

    stem_channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c1, c2 = self.stem_channels[1], self.stem_channels[2]
        x = ConvBNAct(c1, 3, strides=2, name="stem1")(x)
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        a = ConvBNAct(c1 // 2, 2, padding="VALID", name="stem2a")(xp)
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 0)))
        a = ConvBNAct(c1, 2, padding="VALID", name="stem2b")(a)
        pooled = nn.max_pool(xp, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([pooled, a], axis=-1)
        x = ConvBNAct(c1, 3, strides=2, name="stem3")(x)
        x = ConvBNAct(c2, 1, name="stem4")(x)
        return x


class LCNetV4DSBlock(nn.Module):
    """Token mixer (dw conv, rep-style when s1) + SE + GELU channel MLP."""

    in_channels: int
    out_channels: int
    stride: tuple[int, int]
    kernel_size: int = 3
    use_se: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin, cout = self.in_channels, self.out_channels
        rep_dw = self.stride == (1, 1) and cin == cout
        if rep_dw:
            # inference-fused reparam dw conv: plain conv with bias, no BN/act
            x = nn.Conv(
                cout,
                (self.kernel_size, self.kernel_size),
                padding=[(self.kernel_size // 2,) * 2] * 2,
                feature_group_count=cin,
                use_bias=True,
                name="token_conv",
            )(x)
        else:
            x = ConvBNAct(
                cin,
                self.kernel_size,
                strides=self.stride,
                groups=cin,
                act=None,
                name="token_conv",
            )(x)
        if self.use_se:
            x = SqueezeExcite(cin, name="se")(x)
        residual = x
        h = ConvBNAct(cin * 2, 1, act=None, name="channel_conv1")(x)
        h = act_fn("gelu")(h)
        h = ConvBNAct(cout, 1, act=None, name="channel_conv2")(h)
        if cin == cout and self.stride == (1, 1):
            h = residual + h
        return h


class PPLCNetV4(nn.Module):
    """Returns the four stage feature maps (det) or pooled rec features."""

    det: bool = True
    model_size: str = "small"

    @nn.compact
    def __call__(self, x: jax.Array):
        cfg = (NET_CONFIG_DET if self.det else NET_CONFIG_REC)[self.model_size]
        x = LCNetV4Stem(cfg["stem_channels"], name="stem")(x)
        feats = []
        for si, stage in enumerate(cfg["block_configs"]):
            for bi, (k, cin, cout, stride, use_se) in enumerate(stage):
                stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
                x = LCNetV4DSBlock(
                    cin, cout, stride, k, use_se, name=f"stage{si}_block{bi}"
                )(x)
            feats.append(x)
        if self.det:
            return feats
        # rec: final (3,2) avg pool collapses height to 1
        x = feats[-1]
        x = nn.avg_pool(x, (3, 2), strides=(3, 2), padding="VALID")
        return x
