"""PPHGNetV2 backbone in flax (det mode: multi-scale features for RT-DETR).

Architecture per the reference torch spec (reference:
rapid_doc/model/ocr/ppocrv6_pytorch/modeling/backbones/rec_pphgnetv2.py:
StemBlock :963, HGV2_Block :1041, HGV2_Stage :1121, B0-B6 configs :1331+).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common.layers import ConvBNAct

# stage config: in, mid, out, blocks, downsample, light, kernel, layers
STAGE_CONFIGS = {
    "B0": {
        "stem": [3, 16, 16],
        "stages": [
            [16, 16, 64, 1, False, False, 3, 3],
            [64, 32, 256, 1, True, False, 3, 3],
            [256, 64, 512, 2, True, True, 5, 3],
            [512, 128, 1024, 1, True, True, 5, 3],
        ],
        "use_lab": True,
    },
    "B2": {
        "stem": [3, 24, 32],
        "stages": [
            [32, 32, 96, 1, False, False, 3, 4],
            [96, 64, 384, 1, True, False, 3, 4],
            [384, 128, 768, 3, True, True, 5, 4],
            [768, 256, 1536, 1, True, True, 5, 4],
        ],
        "use_lab": True,
    },
    "B4": {
        "stem": [3, 32, 48],
        "stages": [
            [48, 48, 128, 1, False, False, 3, 6],
            [128, 96, 512, 1, True, False, 3, 6],
            [512, 192, 1024, 3, True, True, 5, 6],
            [1024, 384, 2048, 1, True, True, 5, 6],
        ],
        "use_lab": False,
    },
    "B5": {
        "stem": [3, 32, 64],
        "stages": [
            [64, 64, 128, 1, False, False, 3, 6],
            [128, 128, 512, 2, True, False, 3, 6],
            [512, 256, 1024, 5, True, True, 5, 6],
            [1024, 512, 2048, 2, True, True, 5, 6],
        ],
        "use_lab": False,
    },
    "B6": {
        "stem": [3, 48, 96],
        "stages": [
            [96, 96, 192, 2, False, False, 3, 6],
            [192, 192, 512, 3, True, False, 3, 6],
            [512, 384, 1024, 6, True, True, 5, 6],
            [1024, 768, 2048, 3, True, True, 5, 6],
        ],
        "use_lab": False,
    },
}


class LearnableAffine(nn.Module):
    """LAB: y = scale * x + bias (scalar parameters)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return scale * x + bias


class HGConvBNAct(nn.Module):
    """ConvBNAct with optional LAB (HGNet flavor, ReLU)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    use_act: bool = True
    use_lab: bool = False
    padding: str | None = None  # None = torch (k-1)//2 semantics

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ConvBNAct(
            self.features,
            self.kernel_size,
            strides=self.strides,
            groups=self.groups,
            act="relu" if self.use_act else None,
            padding=self.padding,
            name="cba",
        )(x)
        if self.use_act and self.use_lab:
            x = LearnableAffine(name="lab")(x)
        return x


class HGLightConv(nn.Module):
    """1x1 (no act) + depthwise kxk (act)."""

    features: int
    kernel_size: int = 3
    use_lab: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = HGConvBNAct(self.features, 1, use_act=False, use_lab=self.use_lab,
                        name="conv1")(x)
        x = HGConvBNAct(
            self.features, self.kernel_size, groups=self.features,
            use_act=True, use_lab=self.use_lab, name="conv2",
        )(x)
        return x


class HGStem(nn.Module):
    stem_channels: Sequence[int]
    use_lab: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        _, mid, out = self.stem_channels
        x = HGConvBNAct(mid, 3, strides=2, use_lab=self.use_lab, name="stem1")(x)
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        # k=2 convs run VALID on the pre-padded tensor (= torch pad="same"
        # right/bottom for even kernels)
        a = HGConvBNAct(mid // 2, 2, padding="VALID", use_lab=self.use_lab,
                        name="stem2a")(xp)
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 0)))
        a = HGConvBNAct(mid, 2, padding="VALID", use_lab=self.use_lab,
                        name="stem2b")(a)
        pooled = nn.max_pool(xp, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([pooled, a], axis=-1)
        x = HGConvBNAct(mid, 3, strides=2, use_lab=self.use_lab, name="stem3")(x)
        x = HGConvBNAct(out, 1, use_lab=self.use_lab, name="stem4")(x)
        return x


class HGBlock(nn.Module):
    mid_channels: int
    out_channels: int
    kernel_size: int = 3
    layer_num: int = 6
    identity: bool = False
    light_block: bool = True
    use_lab: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        outputs = [x]
        h = x
        for i in range(self.layer_num):
            if self.light_block:
                h = HGLightConv(
                    self.mid_channels, self.kernel_size, self.use_lab,
                    name=f"layer{i}",
                )(h)
            else:
                h = HGConvBNAct(
                    self.mid_channels, self.kernel_size, use_lab=self.use_lab,
                    name=f"layer{i}",
                )(h)
            outputs.append(h)
        h = jnp.concatenate(outputs, axis=-1)
        h = HGConvBNAct(self.out_channels // 2, 1, use_lab=self.use_lab,
                        name="agg_squeeze")(h)
        h = HGConvBNAct(self.out_channels, 1, use_lab=self.use_lab,
                        name="agg_excite")(h)
        if self.identity:
            h = h + residual
        return h


class HGStage(nn.Module):
    in_channels: int
    mid_channels: int
    out_channels: int
    block_num: int
    layer_num: int = 6
    downsample: bool = True
    light_block: bool = True
    kernel_size: int = 3
    use_lab: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.downsample:
            x = HGConvBNAct(
                self.in_channels, 3, strides=2, groups=self.in_channels,
                use_act=False, use_lab=self.use_lab, name="downsample",
            )(x)
        for i in range(self.block_num):
            x = HGBlock(
                self.mid_channels, self.out_channels, self.kernel_size,
                self.layer_num, identity=i > 0, light_block=self.light_block,
                use_lab=self.use_lab, name=f"block{i}",
            )(x)
        return x


class PPHGNetV2(nn.Module):
    """Det-mode backbone: returns features at the requested stage indices."""

    size: str = "B4"
    out_indices: tuple[int, ...] = (1, 2, 3)  # strides 8, 16, 32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        cfg = STAGE_CONFIGS[self.size]
        use_lab = cfg["use_lab"]
        x = HGStem(cfg["stem"], use_lab, name="stem")(x)
        feats = []
        for si, (cin, mid, cout, nblocks, down, light, k, nlayer) in enumerate(
            cfg["stages"]
        ):
            x = HGStage(
                cin, mid, cout, nblocks, nlayer, down, light, k, use_lab,
                name=f"stage{si}",
            )(x)
            if si in self.out_indices:
                feats.append(x)
        return feats

    @staticmethod
    def out_channels(size: str, out_indices=(1, 2, 3)) -> list[int]:
        cfg = STAGE_CONFIGS[size]
        return [cfg["stages"][i][2] for i in out_indices]
