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


# ---------------------------------------------------------------------------
# Encoder (PPHGNetV2-B6) + published-checkpoint key-layout parity
# ---------------------------------------------------------------------------

def _refnets():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    import refnets

    return refnets


@pytest.mark.slow
def test_encoder_b6_parity():
    """Flax FormulaEncoder == torch PPHGNetV2_B6_Formula + enc_to_dec_proj
    on a synthetic checkpoint (reference rec_pphgnetv2.py:1587), converted
    through encoder_variables_from_torch."""
    import jax.numpy as jnp

    refnets = _refnets()
    bb = refnets.load_formula("backbones.rec_pphgnetv2")
    torch.manual_seed(0)
    ref = bb.PPHGNetV2_B6_Formula(class_num=1024).eval()
    proj = torch.nn.Linear(2048, 64)

    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    sd["head.enc_to_dec_proj.weight"] = proj.weight
    sd["head.enc_to_dec_proj.bias"] = proj.bias

    from rapiddoc_tpu.models.formula.convert import encoder_variables_from_torch
    from rapiddoc_tpu.models.formula.model import FormulaEncoder

    enc_vars = encoder_variables_from_torch(sd)
    encoder = FormulaEncoder(backbone_size="B6", decoder_width=64)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        mem_ref = proj(ref(torch.from_numpy(x)).last_hidden_state).numpy()

    out = encoder.apply(enc_vars, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), mem_ref, atol=2e-3, rtol=1e-3)


def test_published_head_key_layout_conversion():
    """formula-head state dicts in the published BaseModel layout
    (head.decoder.model.decoder.* / head.decoder.lm_head, reference
    rec_ppformulanet_head.py:695-790) convert and match the torch head's
    decoder logits in step-wise cached decode — the regime inference
    actually runs. (The vendored head's eval-mode *multi-token* prefill is
    non-causal: to_4d_export in rec_unimernet_head.py:287 drops the causal
    mask, a latent export-path bug we deliberately do not reproduce.)"""
    import jax.numpy as jnp

    refnets = _refnets()
    hd = _load_small_head(refnets)

    sd = {f"head.{k}": v for k, v in hd.state_dict().items()}
    from rapiddoc_tpu.models.formula.convert import decoder_variables_from_torch
    from rapiddoc_tpu.models.formula.decoder import (
        MBartConfig,
        MBartDecoder,
        MemoryProjector,
    )

    dec_vars, mem_vars = decoder_variables_from_torch(
        sd, layers=2,
        prefix="head.decoder.model.decoder.",
        lm_head_key="head.decoder.lm_head",
    )
    cfg = MBartConfig(
        vocab_size=50000, d_model=64, layers=2, heads=16, ffn=128,
        max_positions=32,
    )
    decoder = MBartDecoder(cfg)
    mem_proj = MemoryProjector(cfg)

    B, S, steps = 2, 6, 5
    rng = np.random.default_rng(2)
    forced = rng.integers(3, 1000, (B, steps)).astype(np.int64)
    forced[:, 0] = 0  # decoder_start_token_id
    memory = rng.standard_normal((B, S, 128)).astype(np.float32)

    ref_logits = []
    past = None
    with torch.no_grad():
        projected = hd.enc_to_dec_proj(torch.from_numpy(memory))
        for t in range(steps):
            out = hd.decoder(
                input_ids=torch.from_numpy(forced[:, t : t + 1]),
                attention_mask=torch.ones((B, t + 1), dtype=torch.int64),
                encoder_hidden_states=projected,
                past_key_values=past,
                use_cache=True,
                output_attentions=False,
                output_hidden_states=False,
                return_dict=True,
            )
            past = out.past_key_values
            ref_logits.append(out.logits[:, -1].numpy())

    hd_dim = cfg.d_model // cfg.heads
    ck = jnp.zeros((cfg.layers, B, steps, cfg.heads, hd_dim), jnp.float32)
    cv = jnp.zeros_like(ck)
    mem_k, mem_v = mem_proj.apply(mem_vars, jnp.asarray(np.asarray(projected)))
    mask = jnp.ones((B, S), bool)
    for t in range(steps):
        logits, ck, cv = decoder.apply(
            dec_vars, jnp.asarray(forced[:, t : t + 1].astype(np.int32)),
            ck, cv, t, mem_k, mem_v, mask,
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, -1]), ref_logits[t], atol=3e-4, rtol=1e-3,
            err_msg=f"step {t}",
        )


def _load_small_head(refnets):
    heads = refnets.load_formula("heads.rec_ppformulanet_head")
    torch.manual_seed(1)
    return heads.PPFormulaNet_Head(
        max_new_tokens=32, decoder_layers=2, decoder_ffn_dim=128,
        decoder_hidden_size=64, encoder_hidden_size=128, in_channels=128,
    ).eval()


def test_formula_batch_predict_recompile_bound():
    """batch_predict pads batch dims to the closed bucket set: varying
    formula counts reuse at most O(shape x batch buckets) programs."""
    import numpy as np

    from rapiddoc_tpu.models.formula.engine import (
        FormulaConfig,
        FormulaRecognizer,
    )

    rec = FormulaRecognizer(
        config=FormulaConfig(max_len=16, vocab_size=64, layers=1,
                             backbone_size="B0", default_length_bucket=8)
    )
    crop = np.full((24, 60, 3), 255, np.uint8)
    crop[8:14, 10:40] = 0
    for n in (1, 3, 2, 4, 1):
        out = rec.batch_predict([crop] * n)
        assert len(out) == n and all(isinstance(s, str) for s in out)
    # one image bucket x batches padded to {1, 2, 4} -> <= 3 programs
    assert rec._compiled[8]._cache_size() <= 3
