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
