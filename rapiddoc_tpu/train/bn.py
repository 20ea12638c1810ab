"""Shared helpers for training flax models that contain BatchNorm.

All conv nets in rapiddoc_tpu carry their BN running statistics in the
"batch_stats" collection (frozen at inference). Trainers run the
forward pass inside `bn_training()` (models/common/layers) so BN
normalizes with per-batch statistics, thread the mutable batch_stats
through the update loop, and save them with the checkpoint.
"""
from __future__ import annotations

from ..models.common.layers import bn_training  # re-export

__all__ = ["bn_training", "split_vars", "join_vars", "apply_mutable"]


def split_vars(variables):
    """variables tree -> (params, batch_stats) ; batch_stats may be {}."""
    return variables["params"], variables.get("batch_stats", {})


def join_vars(params, bstats):
    v = {"params": params}
    if bstats:
        v["batch_stats"] = bstats
    return v


def apply_mutable(model, params, bstats, *args, **kwargs):
    """model.apply with batch-stat mutation; returns (out, new_bstats)."""
    out, upd = model.apply(
        {"params": params, "batch_stats": bstats}, *args,
        mutable=["batch_stats"], **kwargs,
    )
    return out, upd["batch_stats"]
