"""Torch->flax conversion for the formula model.

Maps HF-MBart-style state dicts (the published PP-FormulaNet checkpoints
use this layout via the reference's CustomMBartForCausalLM, reference:
rec_ppformulanet_head.py:633) onto decoder.py module trees.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from ...engine.weights import TorchDict, dense, layernorm, vec


def decoder_variables_from_torch(
    state_dict: Mapping, layers: int = 6, prefix: str = "model.decoder."
) -> tuple[dict, dict]:
    """Returns (decoder_variables, mem_proj_variables)."""
    t = TorchDict(state_dict)

    dec: dict = {
        "embed_tokens": {"embedding": vec(t(f"{prefix}embed_tokens.weight"))},
        "embed_positions": vec(t(f"{prefix}embed_positions.weight")),
        "layernorm_embedding": layernorm(t, f"{prefix}layernorm_embedding"),
        "layer_norm": layernorm(t, f"{prefix}layer_norm"),
    }
    if t.has("lm_head.weight"):
        dec["lm_head"] = dense(t, "lm_head", bias=False)
    mem: dict = {}
    for i in range(layers):
        lp = f"{prefix}layers.{i}."
        dec[f"layer{i}"] = {
            "self_attn": {
                "q_proj": dense(t, f"{lp}self_attn.q_proj"),
                "k_proj": dense(t, f"{lp}self_attn.k_proj"),
                "v_proj": dense(t, f"{lp}self_attn.v_proj"),
                "out_proj": dense(t, f"{lp}self_attn.out_proj"),
            },
            "self_attn_layer_norm": layernorm(t, f"{lp}self_attn_layer_norm"),
            "encoder_attn": {
                "q_proj": dense(t, f"{lp}encoder_attn.q_proj"),
                "out_proj": dense(t, f"{lp}encoder_attn.out_proj"),
            },
            "encoder_attn_layer_norm": layernorm(
                t, f"{lp}encoder_attn_layer_norm"
            ),
            "fc1": dense(t, f"{lp}fc1"),
            "fc2": dense(t, f"{lp}fc2"),
            "final_layer_norm": layernorm(t, f"{lp}final_layer_norm"),
        }
        # cross-attn K/V live in the standalone memory projector
        mem[f"layer{i}_k"] = dense(t, f"{lp}encoder_attn.k_proj")
        mem[f"layer{i}_v"] = dense(t, f"{lp}encoder_attn.v_proj")
    return {"params": dec}, {"params": mem}
