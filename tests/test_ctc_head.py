"""Fused pallas CTC head (matmul + online-softmax argmax)."""
import numpy as np


def test_fused_matches_bf16_reference():
    import jax
    import jax.numpy as jnp

    from rapiddoc_tpu.ops.ctc_head import ctc_head_decode

    rng = np.random.default_rng(0)
    B, T, C, V = 2, 5, 120, 3001
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    w = (rng.standard_normal((C, V)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(V) * 0.1).astype(np.float32)
    ids, conf = ctc_head_decode(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(b)
    )
    # reference at the same precision: bf16 matmul, f32 softmax
    logits = np.asarray(
        (jnp.asarray(feats.reshape(-1, C), jnp.bfloat16)
         @ jnp.asarray(w, jnp.bfloat16)).astype(jnp.float32)
    ) + b
    ref_ids = logits.argmax(-1).reshape(B, T)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    ref_conf = (e.max(-1) / e.sum(-1)).reshape(B, T)
    assert (np.asarray(ids) == ref_ids).all()
    assert np.abs(np.asarray(conf) - ref_conf).max() < 1e-3


def test_fused_vocab_padding_never_wins():
    import jax.numpy as jnp

    from rapiddoc_tpu.ops.ctc_head import ctc_head_decode

    # tiny vocab forces heavy padding; ids must stay < V
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 3, 16)).astype(np.float32)
    w = rng.standard_normal((16, 7)).astype(np.float32)
    b = np.zeros(7, np.float32)
    ids, conf = ctc_head_decode(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(b)
    )
    assert (np.asarray(ids) < 7).all()
    assert (np.asarray(conf) > 0).all() and (np.asarray(conf) <= 1).all()


def test_recognizer_uses_fused_head():
    from rapiddoc_tpu.engine.buckets import BucketSpec
    from rapiddoc_tpu.models.ocr.engine import TextRecognizer

    rec = TextRecognizer(
        charset=[chr(33 + i) for i in range(60)],
        bucket_spec=BucketSpec(heights=(48,), widths=(80,),
                               batch_sizes=(2,)),
    )
    crops = [np.random.randint(0, 255, (48, 64, 3), np.uint8)
             for _ in range(2)]
    out = rec(crops)
    assert len(out) == 2 and all(r is not None for r in out)


def test_quant_head_matches_fp32_argmax():
    """Int8-weight fused head (ops/quant_head.py): argmax/prob agree
    with an fp32 dequantized oracle, and quantization rarely flips the
    argmax vs the original weights (decoder lm_head shapes)."""
    import numpy as np
    import jax.numpy as jnp

    from rapiddoc_tpu.ops.quant_head import (
        fused_argmax_int8,
        quantize_weight_int8,
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    w = rng.standard_normal((512, 4096)).astype(np.float32) * 0.05
    b = rng.standard_normal(4096).astype(np.float32) * 0.01
    wq, s = quantize_weight_int8(w)
    ids, conf = fused_argmax_int8(
        jnp.asarray(x), wq, s, jnp.asarray(b), interpret=True
    )
    deq = np.asarray(wq, np.float32) * np.asarray(s)[None, :]
    ref = x @ deq + b
    np.testing.assert_array_equal(np.asarray(ids), ref.argmax(-1))
    # prob parity with a softmax oracle
    p = np.exp(ref - ref.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(conf), p[np.arange(len(ids)), np.asarray(ids)],
        rtol=2e-2, atol=2e-3,
    )
    # int8 quantization barely moves the decision variable
    agree = (np.asarray(ids) == (x @ w + b).argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_int8_head_decode_token_parity(monkeypatch):
    """greedy_decode with the int8 fused head produces the same token
    stream as the bf16 lm_head on a small decoder (quantization margin
    widened by scaling the head)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rapiddoc_tpu.models.formula.decoder import (
        MBartConfig,
        MBartDecoder,
        MemoryProjector,
        greedy_decode,
    )
    from rapiddoc_tpu.ops.quant_head import quantize_weight_int8

    cfg = MBartConfig(vocab_size=128, d_model=32, layers=1, heads=4,
                      ffn=64, max_positions=16)
    decoder = MBartDecoder(cfg)
    mem_proj = MemoryProjector(cfg)
    rng = jax.random.PRNGKey(0)
    S, max_len = 6, 8
    hd = cfg.d_model // cfg.heads
    dec_vars = decoder.init(
        rng, np.zeros((1, 1), np.int32),
        np.zeros((cfg.layers, 1, max_len, cfg.heads, hd), np.float32),
        np.zeros((cfg.layers, 1, max_len, cfg.heads, hd), np.float32),
        0,
        np.zeros((cfg.layers, 1, S, cfg.heads, hd), np.float32),
        np.zeros((cfg.layers, 1, S, cfg.heads, hd), np.float32),
        np.ones((1, S), bool),
    )
    # widen the head so argmax is tie-free under int8 rounding
    dec_vars = jax.tree_util.tree_map_with_path(
        lambda p, a: a * 4.0
        if any(getattr(k, "key", "") == "lm_head" for k in p) else a,
        dec_vars,
    )
    mem_vars = mem_proj.init(rng, np.zeros((1, S, cfg.d_model), np.float32))
    memory = np.random.default_rng(0).standard_normal(
        (2, S, cfg.d_model)
    ).astype(np.float32)
    mask = np.ones((2, S), bool)

    tok_a, len_a = greedy_decode(
        decoder, dec_vars, mem_proj, mem_vars, jnp.asarray(memory),
        jnp.asarray(mask), max_len, dtype=jnp.float32,
    )
    wq, s = quantize_weight_int8(
        dec_vars["params"]["lm_head"]["kernel"]
    )
    tok_b, len_b = greedy_decode(
        decoder, dec_vars, mem_proj, mem_vars, jnp.asarray(memory),
        jnp.asarray(mask), max_len, dtype=jnp.float32,
        int8_head=(wq, s),
    )
    # int8 rounding may flip a rare near-tie argmax (observed: 1 token
    # in 16 on this random-init net); sequences must stay near-identical
    a, b = np.asarray(tok_a), np.asarray(tok_b)
    agree = (a == b).mean()
    assert agree >= 0.9, (agree, a, b)
    np.testing.assert_array_equal(a[:, 0], b[:, 0])
