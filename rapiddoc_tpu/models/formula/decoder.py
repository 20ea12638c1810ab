"""MBart-style causal decoder with KV-cached greedy decode (TPU-native).

Architecture per the reference formula head spec (reference:
rapid_doc/model/formula/rapid_formula_self/networks/heads/
rec_ppformulanet_head.py:695-790 — MBart decoder: pre-norm layers,
16 heads, gelu FFN, scale_embedding, learned positions with offset 2,
layernorm_embedding + final_layer_norm, separate lm_head, vocab 50000,
pad=1, eos=2).

Decode is a lax.while_loop over a static max-length bucket with a
preallocated KV cache and per-batch done-masking — no recompiles across
sequence lengths, early exit when every sequence has emitted EOS.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

POS_OFFSET = 2  # MBart learned-position offset


class MBartConfig(NamedTuple):
    vocab_size: int = 50000
    d_model: int = 512
    layers: int = 6
    heads: int = 16
    ffn: int = 2048
    max_positions: int = 2560
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2


class CachedAttention(nn.Module):
    """Self-attention with an externally-managed KV cache slot."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, cache_k, cache_v, position, causal_mask=None):
        """x: (B, T, C) new tokens; cache_k/v: (B, S, H, hd) full buffers.
        position: scalar index where x starts. Returns (out, new_k, new_v)."""
        B, T, C = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="q_proj")(x).reshape(B, T, self.heads, hd)
        k = nn.Dense(self.dim, name="k_proj")(x).reshape(B, T, self.heads, hd)
        v = nn.Dense(self.dim, name="v_proj")(x).reshape(B, T, self.heads, hd)
        q = q * (hd**-0.5)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, position, 0, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, position, 0, 0)
        )
        S = cache_k.shape[1]
        attn = jnp.einsum("bthd,bshd->bhts", q, cache_k)
        # mask: key position must be <= query position (absolute)
        key_pos = jnp.arange(S)[None, None, None, :]
        query_pos = position + jnp.arange(T)[None, None, :, None]
        mask = key_pos <= query_pos
        attn = jnp.where(mask, attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, cache_v.astype(x.dtype))
        out = out.reshape(B, T, C)
        return nn.Dense(self.dim, name="out_proj")(out), cache_k, cache_v


class CrossAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mem_k, mem_v, mem_mask=None):
        """mem_k/v: precomputed (B, S, H, hd)."""
        B, T, C = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="q_proj")(x).reshape(B, T, self.heads, hd)
        q = q * (hd**-0.5)
        attn = jnp.einsum("bthd,bshd->bhts", q, mem_k.astype(x.dtype))
        if mem_mask is not None:
            attn = jnp.where(mem_mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, mem_v.astype(x.dtype))
        return nn.Dense(self.dim, name="out_proj")(out.reshape(B, T, C))


class MBartDecoderLayer(nn.Module):
    cfg: MBartConfig

    @nn.compact
    def __call__(self, x, cache_k, cache_v, position, mem_k, mem_v, mem_mask):
        c = self.cfg
        residual = x
        h = nn.LayerNorm(name="self_attn_layer_norm", dtype=x.dtype)(x)
        h, cache_k, cache_v = CachedAttention(c.d_model, c.heads, name="self_attn")(
            h, cache_k, cache_v, position
        )
        x = residual + h
        residual = x
        h = nn.LayerNorm(name="encoder_attn_layer_norm", dtype=x.dtype)(x)
        h = CrossAttention(c.d_model, c.heads, name="encoder_attn")(
            h, mem_k, mem_v, mem_mask
        )
        x = residual + h
        residual = x
        h = nn.LayerNorm(name="final_layer_norm", dtype=x.dtype)(x)
        h = nn.Dense(c.ffn, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.d_model, name="fc2")(h)
        return residual + h, cache_k, cache_v


class MBartDecoder(nn.Module):
    """Single-step (or multi-token) decoder forward over cached state.

    skip_lm_head=True returns the pre-head hidden states instead of
    logits — the int8 fused head (ops/quant_head.py) projects + argmaxes
    them without materializing (B, vocab) logits."""

    cfg: MBartConfig
    skip_lm_head: bool = False

    @nn.compact
    def __call__(self, tokens, caches_k, caches_v, position, mem_k_layers,
                 mem_v_layers, mem_mask):
        """tokens: (B, T) int32; caches: (L, B, S, H, hd) stacked buffers.
        Returns (logits (B, T, vocab), new caches)."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.d_model, name="embed_tokens")(tokens)
        emb = emb * jnp.asarray(np.sqrt(c.d_model), emb.dtype)
        pos_table = self.param(
            "embed_positions",
            nn.initializers.normal(0.02),
            (c.max_positions + POS_OFFSET, c.d_model),
        )
        T = tokens.shape[1]
        pos = jax.lax.dynamic_slice_in_dim(
            pos_table, position + POS_OFFSET, T, axis=0
        )
        x = emb + pos[None].astype(emb.dtype)
        x = nn.LayerNorm(name="layernorm_embedding", dtype=x.dtype)(x)
        new_k, new_v = [], []
        for i in range(c.layers):
            x, ck, cv = MBartDecoderLayer(c, name=f"layer{i}")(
                x, caches_k[i], caches_v[i], position,
                mem_k_layers[i], mem_v_layers[i], mem_mask,
            )
            new_k.append(ck)
            new_v.append(cv)
        x = nn.LayerNorm(name="layer_norm", dtype=x.dtype)(x)
        if self.skip_lm_head:
            return x, jnp.stack(new_k), jnp.stack(new_v)
        logits = nn.Dense(c.vocab_size, use_bias=False, name="lm_head")(x)
        return logits, jnp.stack(new_k), jnp.stack(new_v)


class MemoryProjector(nn.Module):
    """Precompute per-layer cross-attention K/V from encoder memory."""

    cfg: MBartConfig

    @nn.compact
    def __call__(self, memory):
        """memory: (B, S, d_model) already projected to decoder width.
        Returns (L, B, S, H, hd) K and V stacks."""
        c = self.cfg
        hd = c.d_model // c.heads
        B, S, _ = memory.shape
        ks, vs = [], []
        for i in range(c.layers):
            k = nn.Dense(c.d_model, name=f"layer{i}_k")(memory)
            v = nn.Dense(c.d_model, name=f"layer{i}_v")(memory)
            ks.append(k.reshape(B, S, c.heads, hd))
            vs.append(v.reshape(B, S, c.heads, hd))
        return jnp.stack(ks), jnp.stack(vs)


def greedy_decode(
    decoder: MBartDecoder,
    dec_vars,
    mem_proj: MemoryProjector,
    mem_vars,
    memory: jax.Array,
    mem_mask: jax.Array,
    max_len: int,
    dtype=jnp.bfloat16,
    int8_head: tuple | None = None,
):
    """Batched greedy AR decode under lax.while_loop with early exit.

    memory: (B, S, d_model). Returns (tokens (B, max_len), lengths (B,)).

    int8_head=(wq int8 (d_model, vocab), scale (vocab,)) replaces the
    bf16 lm_head matmul+argmax with the fused int8 kernel
    (ops/quant_head.py): halves the weight bytes every decode step
    streams from HBM, and the logits never materialize."""
    cfg = decoder.cfg
    B = memory.shape[0]
    hd = cfg.d_model // cfg.heads
    mem_k, mem_v = mem_proj.apply(mem_vars, memory)
    if int8_head is not None:
        decoder = MBartDecoder(cfg, skip_lm_head=True)
        wq_head, head_scale = int8_head
        head_bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
        head_interpret = jax.default_backend() != "tpu"

    caches_k = jnp.zeros((cfg.layers, B, max_len, cfg.heads, hd), dtype)
    caches_v = jnp.zeros_like(caches_k)
    tokens = jnp.full((B, max_len), cfg.pad_token_id, jnp.int32)
    cur = jnp.full((B, 1), cfg.bos_token_id, jnp.int32)
    done = jnp.zeros((B,), jnp.bool_)
    lengths = jnp.zeros((B,), jnp.int32)

    def cond(state):
        step, _, _, _, _, done, _ = state
        return (step < max_len) & ~jnp.all(done)

    def body(state):
        step, cur, tokens, ck, cv, done, lengths = state
        out, ck, cv = decoder.apply(
            dec_vars, cur, ck, cv, step, mem_k, mem_v, mem_mask
        )
        if int8_head is not None:
            from ...ops.quant_head import fused_argmax_int8

            nxt, _conf = fused_argmax_int8(
                out[:, -1], wq_head, head_scale, head_bias,
                interpret=head_interpret,
            )
            nxt = nxt.astype(jnp.int32)
        else:
            nxt = jnp.argmax(
                out[:, -1].astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
        newly_done = nxt == cfg.eos_token_id
        lengths = jnp.where(done, lengths, step + 1)
        done = done | newly_done
        return step + 1, nxt[:, None], tokens, ck, cv, done, lengths

    state = (0, cur, tokens, caches_k, caches_v, done, lengths)
    _, _, tokens, _, _, _, lengths = jax.lax.while_loop(cond, body, state)
    return tokens, lengths
