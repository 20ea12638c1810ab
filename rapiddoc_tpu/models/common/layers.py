"""Common NN building blocks (flax/linen, NHWC, inference-first).

These reproduce the PaddleOCR-family layer semantics documented by the
reference's torch re-implementations (reference:
rapid_doc/model/ocr/ppocrv6_pytorch/modeling/ — the architecture spec per
SURVEY.md §2.9) as idiomatic JAX: NHWC layouts, erf-GELU to match torch,
exact k2s2 deconv via einsum+reshape (MXU-friendly, bit-equal to torch's
ConvTranspose2d).
"""
from __future__ import annotations

import contextvars
from contextlib import contextmanager
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Trace-time switch: inside `bn_training()` BatchNorm layers normalize
# with the current batch's statistics and update the running stats in
# the mutable "batch_stats" collection (the caller must pass
# mutable=["batch_stats"] to apply). Outside (inference, converted
# checkpoints) they use the stored running stats. The flag is read when
# a jitted function is TRACED, so trainers must trace their step inside
# the context.
_BN_TRAIN = contextvars.ContextVar("rapiddoc_bn_train", default=False)


@contextmanager
def bn_training():
    token = _BN_TRAIN.set(True)
    try:
        yield
    finally:
        _BN_TRAIN.reset(token)


def act_fn(name: str | None) -> Callable:
    if name is None or name == "identity":
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "relu6":
        return jax.nn.relu6
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "hardsigmoid":
        return jax.nn.hard_sigmoid
    if name == "hardswish":
        return jax.nn.hard_swish
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"unknown activation {name!r}")


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm(frozen stats) -> activation."""

    features: int
    kernel_size: tuple[int, int] | int = 3
    strides: tuple[int, int] | int = 1
    groups: int = 1
    act: str | None = "relu"
    padding: str | Sequence[tuple[int, int]] | None = None  # None = SAME-like (k-1)//2
    use_bias: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        s = (
            (self.strides, self.strides)
            if isinstance(self.strides, int)
            else tuple(self.strides)
        )
        if self.padding is None:
            pad = [((k[0] - 1) // 2, (k[0] - 1) // 2), ((k[1] - 1) // 2, (k[1] - 1) // 2)]
        else:
            pad = self.padding
        x = nn.Conv(
            self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not _BN_TRAIN.get(), epsilon=1e-5,
                name="bn", dtype=x.dtype,
            )(x)
        return act_fn(self.act)(x)


class SqueezeExcite(nn.Module):
    """Classic SE: pool -> fc/conv down -> relu -> up -> hardsigmoid -> scale."""

    channels: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), name="fc2")(s)
        s = jax.nn.hard_sigmoid(s)
        return x * s


class ClampSqueezeExcite(nn.Module):
    """SE variant with clamp(0.2x + 0.5) gating (RepLKFPN flavor)."""

    channels: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), name="fc2")(s)
        s = jnp.clip(0.2 * s + 0.5, 0.0, 1.0)
        return x * s


def deconv2x2(x: jax.Array, kernel: jax.Array, bias: jax.Array | None) -> jax.Array:
    """Exact ConvTranspose2d(k=2, s=2, p=0): einsum + pixel-shuffle reshape.

    kernel layout: (Cin, Cout, 2, 2) (torch layout kept for conversion ease).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[1]
    y = jnp.einsum("bhwi,iokl->bhkwlo", x, kernel.astype(x.dtype))
    y = y.reshape(b, h * 2, w * 2, cout)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


class Deconv2x2BNAct(nn.Module):
    """ConvTranspose(k2,s2) + optional BN + act, exactly matching torch."""

    in_features: int
    features: int
    act: str | None = "relu"
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features, 2, 2),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = deconv2x2(x, kernel, bias)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not _BN_TRAIN.get(), epsilon=1e-5,
                name="bn", dtype=x.dtype,
            )(x)
        return act_fn(self.act)(x)


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor 2x/4x/8x upsample via repeat (cheap on TPU)."""
    if scale == 1:
        return x
    b, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def max_pool_2x2_s1_ceil(x: jax.Array) -> jax.Array:
    """MaxPool k2 s1 with ceil semantics via edge pad (PPLCNetV4 stem)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    return nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")


class MHSA(nn.Module):
    """Standard multi-head self-attention over (B, N, C) sequences."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class TransformerBlock(nn.Module):
    """Pre-norm transformer block (LightSVTR / SVTR / torch-encoder flavor)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    act: str = "silu"
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1", dtype=x.dtype)(x)
        x = x + MHSA(self.dim, self.num_heads, self.qkv_bias, name="attn")(h)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2", dtype=x.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = act_fn(self.act)(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h
