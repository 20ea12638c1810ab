"""Fused CTC head: matmul + online-softmax argmax in one pallas kernel.

The rec head projects (B*T, C) features onto an 18710-char vocabulary
(reference: rapid_doc/model/ocr/ppocrv6_pytorch/modeling/heads/
rec_ctc_head.py + the 18710-entry dict) and greedy CTC only needs the
argmax id and its softmax probability per frame. Materializing the
(B*T, 18710) logits costs ~150 MB of HBM write+read per rec batch; this
kernel streams vocabulary tiles through VMEM, keeping a running
(max, argmax, shifted-exp-sum) per row — the logits never touch HBM.

Grid: (row tiles, vocab tiles); TPU grids execute sequentially with the
last axis fastest, so VMEM scratch carries the online-softmax state
across vocab tiles of one row tile (init at j==0, finalize at j==last).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
TILE_V = 1024
NEG = -1e30


def _kernel(x_ref, w_ref, b_ref, ids_ref, conf_ref, m_ref, a_ref, d_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        a_ref[:] = jnp.zeros_like(a_ref)
        d_ref[:] = jnp.zeros_like(d_ref)

    logits = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ) + b_ref[:].astype(jnp.float32)  # (TILE_M, TILE_V)
    tile_max = jnp.max(logits, axis=1, keepdims=True)
    tile_arg = (
        jnp.argmax(logits, axis=1).astype(jnp.int32).reshape(-1, 1)
        + j * TILE_V
    )
    run_max = m_ref[:]
    new_max = jnp.maximum(run_max, tile_max)
    d_ref[:] = d_ref[:] * jnp.exp(run_max - new_max) + jnp.sum(
        jnp.exp(logits - new_max), axis=1, keepdims=True
    )
    a_ref[:] = jnp.where(tile_max > run_max, tile_arg, a_ref[:])
    m_ref[:] = new_max

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ids_ref[:] = a_ref[:]
        # softmax prob of the argmax: exp(max - logsumexp) = 1 / denom
        conf_ref[:] = 1.0 / jnp.maximum(d_ref[:], 1e-30)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@partial(jax.jit, static_argnames=("interpret",))
def fused_ctc_argmax(
    x: jax.Array, kernel: jax.Array, bias: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """x (N, C) features; kernel (C, V); bias (V,).
    Returns (ids (N,) int32, top softmax prob (N,) float32)."""
    n, c = x.shape
    v = kernel.shape[1]
    npad = _round_up(max(n, 8), TILE_M)
    cpad = _round_up(c, 128)
    vpad = _round_up(v, TILE_V)
    xp = jnp.zeros((npad, cpad), jnp.bfloat16).at[:n, :c].set(
        x.astype(jnp.bfloat16)
    )
    wp = jnp.zeros((cpad, vpad), jnp.bfloat16).at[:c, :v].set(
        kernel.astype(jnp.bfloat16)
    )
    # padded vocab columns must never win the argmax
    bp = jnp.full((1, vpad), NEG, jnp.float32).at[0, :v].set(
        bias.astype(jnp.float32)
    )

    grid = (npad // TILE_M, vpad // TILE_V)
    ids, conf = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, cpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpad, TILE_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_M, 1), jnp.float32),
            pltpu.VMEM((TILE_M, 1), jnp.int32),
            pltpu.VMEM((TILE_M, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wp, bp)
    return ids[:n, 0], conf[:n, 0]


def ctc_head_decode(
    feats: jax.Array, kernel: jax.Array, bias: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(B, T, C) neck features -> (ids (B, T), probs (B, T)) without
    materializing (B, T, vocab) logits. Falls back to pallas interpreter
    mode off-TPU so CPU tests exercise the same code path."""
    b, t, c = feats.shape
    interpret = jax.default_backend() != "tpu"
    ids, conf = fused_ctc_argmax(
        feats.reshape(b * t, c), kernel, bias, interpret=interpret
    )
    return ids.reshape(b, t), conf.reshape(b, t)
