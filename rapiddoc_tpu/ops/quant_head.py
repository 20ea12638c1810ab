"""Int8-weight fused projection head: quantized matmul + argmax.

AR decode steps are WEIGHT-BOUND: the formula decoder's lm_head
(512 x 50000) streams ~50 MB of bf16 per step while the step's FLOPs
take microseconds (reference decoder: rec_ppformulanet_head.py wraps an
HF-MBart lm_head of this exact shape). Storing the weight int8 with a
per-column scale halves the HBM traffic per step — the kernel converts
int8 tiles to bf16 in VMEM, so the MXU still runs its native dtype and
the logits never materialize in HBM (same online-argmax streaming as
ops/ctc_head.py).

Greedy decode only consumes argmax(logits) (+ the prob for confidence),
so the head output is (ids, prob) — not logits.

MEASURED FINDING (round 5, single tunneled chip): at the published head
shape (16, 512) x (512, 50000) XLA's plain bf16 matmul+argmax runs
~0.02 ms/step — faster than both this kernel (~0.06 ms) and an XLA
int8-weight variant (~0.08 ms). The chip's effective HBM bandwidth is
high enough that the bf16 head is not weight-bound at this shape, and
the int8->bf16 conversion cost dominates the halved bytes. The kernel
stays available behind RAPIDDOC_INT8_HEAD=1 for bandwidth-constrained
parts (and as the int8 pattern for future fully-quantized matmuls), but
the default decode path keeps the bf16 head. bench.py's quant_head
section records the comparison every run.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 16
TILE_V = 8192
NEG = -1e30


def quantize_weight_int8(w) -> tuple[jax.Array, jax.Array]:
    """(K, V) float weight -> (int8 weight, float32 per-column scale)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(x_ref, wq_ref, s_ref, b_ref, ids_ref, conf_ref,
            m_ref, a_ref, d_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        a_ref[:] = jnp.zeros_like(a_ref)
        d_ref[:] = jnp.zeros_like(d_ref)

    # int8 -> bf16 in VMEM; scale folds in AFTER the dot (per-column)
    w = wq_ref[:].astype(jnp.bfloat16)
    logits = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    logits = logits * s_ref[:].astype(jnp.float32) + b_ref[:].astype(
        jnp.float32
    )
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
        conf_ref[:] = 1.0 / jnp.maximum(d_ref[:], 1e-30)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@partial(jax.jit, static_argnames=("interpret",))
def fused_argmax_int8(
    x: jax.Array, wq: jax.Array, scale: jax.Array, bias: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """x (N, K) features; wq (K, V) int8; scale (V,); bias (V,).
    Returns (argmax ids (N,) int32, softmax prob of the argmax (N,))."""
    n, k = x.shape
    v = wq.shape[1]
    npad = _round_up(max(n, 8), TILE_M)
    kpad = _round_up(k, 128)
    vpad = _round_up(v, TILE_V)
    xp = jnp.zeros((npad, kpad), jnp.bfloat16).at[:n, :k].set(
        x.astype(jnp.bfloat16)
    )
    wp = jnp.zeros((kpad, vpad), jnp.int8).at[:k, :v].set(wq)
    # padded vocab columns: scale 0 and bias NEG so they never win
    sp = jnp.zeros((1, vpad), jnp.float32).at[0, :v].set(
        scale.astype(jnp.float32)
    )
    bp = jnp.full((1, vpad), NEG, jnp.float32).at[0, :v].set(
        bias.astype(jnp.float32)
    )
    grid = (npad // TILE_M, vpad // TILE_V)
    ids, conf = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, kpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, TILE_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_V), lambda i, j: (0, j),
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
    )(xp, wp, sp, bp)
    return ids[:n, 0], conf[:n, 0]
