"""Formula decoder parity vs HuggingFace MBartForCausalLM (the layout the
published PP-FormulaNet checkpoints use, per the reference head)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 211
DM = 64
LAYERS = 2
HEADS = 4
FFN = 128
MAXPOS = 64


@pytest.fixture(scope="module")
def hf_model():
    from transformers import MBartConfig as HFConfig
    from transformers import MBartForCausalLM

    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=VOCAB,
        d_model=DM,
        decoder_layers=LAYERS,
        decoder_attention_heads=HEADS,
        decoder_ffn_dim=FFN,
        max_position_embeddings=MAXPOS,
        activation_function="gelu",
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        is_decoder=True,
        is_encoder_decoder=False,
        add_cross_attention=True,
        add_final_layer_norm=True,
        scale_embedding=True,
        tie_word_embeddings=False,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
    )
    model = MBartForCausalLM(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_modules(hf_model):
    import jax.numpy as jnp

    from rapiddoc_tpu.models.formula.convert import decoder_variables_from_torch
    from rapiddoc_tpu.models.formula.decoder import (
        MBartConfig,
        MBartDecoder,
        MemoryProjector,
    )

    cfg = MBartConfig(
        vocab_size=VOCAB, d_model=DM, layers=LAYERS, heads=HEADS, ffn=FFN,
        max_positions=MAXPOS,
    )
    dec_vars, mem_vars = decoder_variables_from_torch(
        hf_model.state_dict(), layers=LAYERS
    )
    return MBartDecoder(cfg), dec_vars, MemoryProjector(cfg), mem_vars, cfg


def test_decoder_forward_parity(hf_model, jax_modules):
    import jax.numpy as jnp

    decoder, dec_vars, mem_proj, mem_vars, cfg = jax_modules
    B, T, S = 2, 7, 11
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, VOCAB, (B, T)).astype(np.int32)
    memory = rng.standard_normal((B, S, DM)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            encoder_hidden_states=torch.from_numpy(memory),
        ).logits.numpy()

    hd = DM // HEADS
    caches_k = jnp.zeros((LAYERS, B, T, HEADS, hd), jnp.float32)
    caches_v = jnp.zeros_like(caches_k)
    mem_k, mem_v = mem_proj.apply(mem_vars, jnp.asarray(memory))
    logits, _, _ = decoder.apply(
        dec_vars, jnp.asarray(tokens), caches_k, caches_v, 0,
        mem_k, mem_v, jnp.ones((B, S), bool),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


def test_cached_stepwise_logits_parity(hf_model, jax_modules):
    """Teacher-forced incremental decode: per-step logits must match HF's
    cached decode numerically (tie-insensitive, unlike token comparison —
    with random weights HF's own cached vs uncached paths pick different
    argmaxes at near-ties)."""
    import jax.numpy as jnp

    decoder, dec_vars, mem_proj, mem_vars, cfg = jax_modules
    B, S, steps = 2, 9, 10
    rng = np.random.default_rng(1)
    memory = rng.standard_normal((B, S, DM)).astype(np.float32)
    forced = rng.integers(3, VOCAB, (B, steps)).astype(np.int64)
    forced[:, 0] = 0  # BOS

    hf_logits = []
    past = None
    with torch.no_grad():
        for t in range(steps):
            out = hf_model(
                input_ids=torch.from_numpy(forced[:, t : t + 1]),
                encoder_hidden_states=torch.from_numpy(memory),
                past_key_values=past,
                use_cache=True,
            )
            past = out.past_key_values
            hf_logits.append(out.logits[:, -1].numpy())

    hd = DM // HEADS
    ck = jnp.zeros((LAYERS, B, steps, HEADS, hd), jnp.float32)
    cv = jnp.zeros_like(ck)
    mem_k, mem_v = mem_proj.apply(mem_vars, jnp.asarray(memory))
    mask = jnp.ones((B, S), bool)
    for t in range(steps):
        logits, ck, cv = decoder.apply(
            dec_vars, jnp.asarray(forced[:, t : t + 1].astype(np.int32)),
            ck, cv, t, mem_k, mem_v, mask,
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, -1]), hf_logits[t], atol=3e-4, rtol=1e-3,
            err_msg=f"step {t}",
        )


def test_greedy_decode_early_exit(jax_modules):
    """All-EOS-immediately memory should terminate fast with length 1."""
    import jax.numpy as jnp

    from rapiddoc_tpu.models.formula.decoder import greedy_decode

    decoder, dec_vars, mem_proj, mem_vars, cfg = jax_modules
    memory = np.zeros((1, 4, DM), np.float32)
    tokens, lengths = greedy_decode(
        decoder, dec_vars, mem_proj, mem_vars, jnp.asarray(memory),
        jnp.ones((1, 4), bool), 16, dtype=jnp.float32,
    )
    assert tokens.shape == (1, 16)
    assert 1 <= int(np.asarray(lengths)[0]) <= 16
