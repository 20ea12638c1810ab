"""UNITABLE parity vs the reference torch modules (unitable_modules.py),
through unitable_variables_from_torch on synthetic checkpoints."""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import refnets  # noqa: E402

UNITABLE_REF = (
    "/root/reference/rapid_doc/model/table/rapid_table_self/"
    "table_structure/unitable/unitable_modules.py"
)


@pytest.fixture(scope="module")
def ref_mod():
    if not Path(UNITABLE_REF).is_file():
        pytest.skip("reference checkout unavailable")
    return refnets.load_file("_ref_unitable_modules", UNITABLE_REF)


@pytest.mark.slow
def test_unitable_encoder_parity(ref_mod):
    import jax.numpy as jnp

    from rapiddoc_tpu.models.table.convert import (
        unitable_encoder_variables_from_torch,
    )
    from rapiddoc_tpu.models.table.unitable import UniTableEncoder

    torch.manual_seed(0)
    ref = ref_mod.Encoder().eval()
    enc_vars = unitable_encoder_variables_from_torch(ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 448, 448)).astype(np.float32)
    with torch.no_grad():
        mem_ref = ref(torch.from_numpy(x)).numpy()

    out = UniTableEncoder().apply(
        enc_vars, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), mem_ref, atol=2e-3, rtol=1e-3)


def test_unitable_decoder_stepwise_parity(ref_mod):
    """Teacher-forced stepwise logits vs the reference GPTFastDecoder
    (cached, reference main.py stepping: last token only + input_pos)."""
    import jax.numpy as jnp
    from torch.nn.attention import SDPBackend, sdpa_kernel

    from rapiddoc_tpu.models.formula.decoder import MemoryProjector
    from rapiddoc_tpu.models.table.convert import (
        unitable_decoder_variables_from_torch,
    )
    from rapiddoc_tpu.models.table.unitable import (
        GPTConfig,
        GPTFastDecoder,
        GPTMemoryCfg,
        PREFIX_ID,
    )

    torch.manual_seed(1)
    ref = ref_mod.GPTFastDecoder().eval()
    dec_vars, mem_vars = unitable_decoder_variables_from_torch(
        ref.state_dict()
    )
    decoder = GPTFastDecoder()
    mem_proj = MemoryProjector(GPTMemoryCfg)

    B, S, steps = 1, 12, 8
    rng = np.random.default_rng(3)
    memory = rng.standard_normal((B, S, GPTConfig.d_model)).astype(np.float32)
    forced = rng.integers(12, 510, (B, steps)).astype(np.int64)
    forced[:, 0] = PREFIX_ID

    ref.setup_caches(
        max_batch_size=B, max_seq_length=steps, dtype=torch.float32,
        device="cpu",
    )
    t_mem = torch.from_numpy(memory)
    ref_logits = []
    with torch.no_grad(), sdpa_kernel(SDPBackend.MATH):
        for t in range(steps):
            # reference GPTFastDecoder.forward sans argmax/white-list
            # (unitable_modules.py:739-752)
            input_pos = torch.tensor([t], dtype=torch.int)
            tgt = torch.from_numpy(forced[:, t : t + 1])
            x = ref.pos_embed(ref.token_embed(tgt), input_pos=input_pos)
            tgt_mask = ref.causal_mask[None, None, input_pos]
            for layer in ref.layers:
                x = layer(x, t_mem, input_pos=input_pos, tgt_mask=tgt_mask)
            ref_logits.append(ref.generator(x)[:, -1].numpy())

    hd = GPTConfig.d_model // GPTConfig.heads
    ck = jnp.zeros((GPTConfig.layers, B, steps, GPTConfig.heads, hd),
                   jnp.float32)
    cv = jnp.zeros_like(ck)
    mem_k, mem_v = mem_proj.apply(mem_vars, jnp.asarray(memory))
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


def test_unitable_decode_whitelist_and_grammar():
    """Batched decode emits only white-listed tokens (+pad after EOS) and
    never more than 4 consecutive bbox tokens per sample."""
    import jax.numpy as jnp

    from rapiddoc_tpu.models.formula.decoder import MemoryProjector
    from rapiddoc_tpu.models.table.unitable import (
        BBOX_BASE,
        EOS_ID,
        GPTConfig,
        GPTFastDecoder,
        GPTMemoryCfg,
        N_BBOX_BINS,
        PAD_ID,
        unitable_decode,
        whitelist_mask,
    )

    import jax

    decoder = GPTFastDecoder()
    mem_proj = MemoryProjector(GPTMemoryCfg)
    rng = jax.random.PRNGKey(0)
    B, S, max_len = 2, 6, 16
    hd = GPTConfig.d_model // GPTConfig.heads
    memory = np.random.default_rng(0).standard_normal(
        (B, S, GPTConfig.d_model)
    ).astype(np.float32)
    mem_vars = mem_proj.init(rng, memory)
    dec_vars = decoder.init(
        rng, np.zeros((1, 1), np.int32),
        np.zeros((GPTConfig.layers, 1, 4, GPTConfig.heads, hd), np.float32),
        np.zeros((GPTConfig.layers, 1, 4, GPTConfig.heads, hd), np.float32),
        0,
        np.zeros((GPTConfig.layers, 1, S, GPTConfig.heads, hd), np.float32),
        np.zeros((GPTConfig.layers, 1, S, GPTConfig.heads, hd), np.float32),
        np.ones((1, S), bool),
    )
    tokens, lengths = unitable_decode(
        decoder, dec_vars, mem_proj, mem_vars, jnp.asarray(memory), max_len,
        dtype=jnp.float32,
    )
    tokens = np.asarray(tokens)
    allowed = set(np.where(whitelist_mask() == 0.0)[0].tolist()) | {PAD_ID}
    for b in range(tokens.shape[0]):
        run = 0
        for tok in tokens[b].tolist():
            assert tok in allowed
            if BBOX_BASE <= tok < BBOX_BASE + N_BBOX_BINS:
                run += 1
                assert run <= 4
            else:
                run = 0


def test_unitable_parse_structure():
    """Token-stream parsing mirrors reference decode_tokens semantics."""
    from rapiddoc_tpu.models.table.unitable import UniTableConfig, UniTableStructure

    s = UniTableStructure.__new__(UniTableStructure)
    toks = [
        "<thead>", "<tr>",
        "<td>[", "bbox-10", "bbox-20", "bbox-110", "bbox-40", "]</td>",
        "<td", ' colspan="2"', ">[", "bbox-0", "bbox-0", "bbox-5", "bbox-5",
        "]</td>",
        "</tr>", "</thead>", "<tbody>", "<tr>", "<td></td>", "</tr>",
        "</tbody>",
    ]
    structure, bboxes = s._parse(toks, 448, 448)
    assert structure == [
        "<thead>", "<tr>", "<td></td>",
        "<td", ' colspan="2"', ">", "</td>",
        "</tr>", "</thead>", "<tbody>", "<tr>", "<td></td>", "</tr>",
        "</tbody>",
    ]
    assert len(bboxes) == 3
    assert bboxes[0] == [10.0, 20.0, 110.0, 40.0]
    assert bboxes[2] == [0.0, 0.0, 0.0, 0.0]
