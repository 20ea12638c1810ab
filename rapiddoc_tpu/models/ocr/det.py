"""DBNet text detection (PP-OCRv6-small flavor) in flax.

Backbone PPLCNetV4(det,small) -> RepLKFPN(96, k7) -> DBHead(ppocrv6).
Architecture per reference spec (reference:
rapid_doc/model/ocr/ppocrv6_pytorch/modeling/necks/db_fpn.py RepLKFPN,
heads/det_db_head.py DBHead mode='ppocrv6',
rapid_doc/resources/arch_config.yaml ch_PP-OCRv6_det_small).
Output: probability map at input resolution, NHW1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common.layers import (
    ClampSqueezeExcite,
    ConvBNAct,
    Deconv2x2BNAct,
    deconv2x2,
    upsample_nearest,
)
from .backbone import PPLCNetV4


class RepLKFPN(nn.Module):
    """Top-down FPN with large-kernel depthwise fusion and clamp-SE."""

    out_channels: int = 96
    dilated_kernel_size: int = 7
    reduction: int = 4
    shortcut: bool = True

    @nn.compact
    def __call__(self, feats: list[jax.Array]) -> jax.Array:
        oc = self.out_channels
        fused = []
        for i, f in enumerate(feats):
            h = nn.Conv(oc, (1, 1), use_bias=False, name=f"insert_conv{i}")(f)
            se = ClampSqueezeExcite(oc, self.reduction, name=f"insert_se{i}")(h)
            fused.append(h + se if self.shortcut else se)
        for i in range(2, -1, -1):
            fused[i] = fused[i] + upsample_nearest(fused[i + 1], 2)
        outs = []
        k = self.dilated_kernel_size
        for i, f in enumerate(fused):
            h = nn.Conv(
                oc, (k, k), padding=[(k // 2, k // 2)] * 2,
                feature_group_count=oc, use_bias=True, name=f"input_dw{i}",
            )(f)
            h = nn.Conv(oc // 4, (1, 1), use_bias=False, name=f"input_pw{i}")(h)
            h = h + ClampSqueezeExcite(oc // 4, self.reduction, name=f"input_se{i}")(h)
            outs.append(upsample_nearest(h, 2**i))
        return jnp.concatenate(outs[::-1], axis=-1)


class DBHeadV6(nn.Module):
    """conv k3 -> deconv k2s2 -> deconv k2s2 -> sigmoid prob map."""

    in_channels: int = 96

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.in_channels // 4
        x = ConvBNAct(c, 3, name="conv_down")(x)
        x = Deconv2x2BNAct(c, c, name="conv_up")(x)
        kernel = self.param(
            "final_kernel", nn.initializers.lecun_normal(), (c, 1, 2, 2)
        )
        bias = self.param("final_bias", nn.initializers.zeros, (1,))
        x = deconv2x2(x, kernel, bias)
        x = jax.nn.sigmoid(x.astype(jnp.float32))
        return jnp.nan_to_num(x)  # fix_nan per reference config


class DBNet(nn.Module):
    """Full text detector; input NHWC normalized image, output NHW1 prob map."""

    model_size: str = "small"
    fpn_channels: int = 96

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = PPLCNetV4(det=True, model_size=self.model_size, name="backbone")(x)
        fused = RepLKFPN(self.fpn_channels, name="neck")(feats)
        return DBHeadV6(self.fpn_channels, name="head")(fused)
