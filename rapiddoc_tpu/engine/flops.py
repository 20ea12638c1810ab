"""Analytic FLOPs / bytes accounting for every jitted program.

Wall-clock behind a tunneled chip says little about how these programs
will run on a real TPU VM — the wire, not the MXU, sets the ceiling
here. This module gives each compiled program an analytic cost from
XLA's HLO cost analysis (``jitted.lower(*abstract_args).cost_analysis()``
— no device compile needed) and accumulates call counts, so the bench
can report per-stage FLOPs, achieved FLOP/s, MFU vs chip peak, and a
compute-bound ms/page projection that is independent of the wire.

Reference has no counterpart (it publishes no speed numbers at all,
/root/reference/README.md); this is the TPU-native accounting BASELINE.md
requires.

Caveat recorded in the report itself: XLA's cost analysis counts a
``while_loop`` body ONCE, so autoregressive decoders (formula / SLANet /
UNITABLE) are under-counted unless the caller passes ``steps=`` to
:func:`track` — engines that know their decode length do.
"""
from __future__ import annotations

import threading
from typing import Any

import jax

_LOCK = threading.Lock()
# (name, sig) -> {"flops": float, "bytes": float} | None when analysis failed
_COSTS: dict[tuple, dict | None] = {}
# (name, sig) -> pending (jitted, abstract_args, abstract_kwargs)
_PENDING: dict[tuple, tuple] = {}
# (name, sig) -> weighted call count (weight = AR steps when known)
_CALLS: dict[tuple, float] = {}

# v5e (TPU v5 lite) public peak: 197 TFLOP/s bf16, 819 GB/s HBM BW,
# host link PCIe gen3-ish ~16 GB/s. Used only for MFU / projection math.
CHIP_PEAK_FLOPS = 197e12
CHIP_HBM_GBPS = 819.0
HOST_LINK_GBPS = 16.0


def _abstract(x: Any):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def _sig_of(tree: Any) -> tuple:
    return tuple(
        (tuple(l.shape), str(l.dtype))
        if hasattr(l, "shape") and hasattr(l, "dtype")
        else ("static", repr(l))
        for l in jax.tree.leaves(tree)
    )


def track(name: str, jitted, args: tuple, *, steps: float = 1.0,
          sig: tuple | None = None) -> None:
    """Record one call of ``jitted(*args)`` under ``name``.

    Cheap on the hot path: only shapes are hashed; the actual HLO cost
    analysis runs lazily (once per (name, signature)) at report time.
    ``steps`` scales the recorded cost — AR decoders pass their decode
    step count so the while-loop body is counted per step, not once.
    ``sig`` short-circuits the signature hash when the caller already
    knows what distinguishes shapes (e.g. a session's bucket key) —
    avoids hashing a many-leaf params tree per dispatch.
    """
    key = (name, sig if sig is not None else _sig_of(args))
    with _LOCK:
        _CALLS[key] = _CALLS.get(key, 0.0) + steps
        if key not in _COSTS and key not in _PENDING:
            _PENDING[key] = (jitted, jax.tree.map(_abstract, args))


_AR_EXTRA: dict[str, dict] = {}


def track_ar_extra(name: str, *, steps: float, batch: int,
                   dec_params: float, dec_param_bytes: float) -> None:
    """Analytic correction for an autoregressive decode program.

    XLA cost analysis counts a while-loop body ONCE, so the lowered cost
    (recorded by the plain :func:`track` at dispatch) covers encoder +
    one decode step. The remaining (steps-1) steps are added here:
    ~2·dec_params FLOPs per token per sample (the dense-matmul MAC
    identity) and one full decoder weight read per step (what actually
    bounds AR decode on TPU — HBM, not MXU). ``steps`` should be the
    realized decode length when the caller knows it (post-fetch), else
    the bucket max (upper bound).
    """
    extra_steps = max(steps - 1.0, 0.0)
    with _LOCK:
        d = _AR_EXTRA.setdefault(name, {"flops": 0.0, "bytes": 0.0})
        d["flops"] += 2.0 * dec_params * batch * extra_steps
        d["bytes"] += dec_param_bytes * extra_steps


def _cost_dict(ca: Any) -> dict | None:
    if isinstance(ca, (list, tuple)):  # older jax: one dict per computation
        ca = ca[0] if ca else None
    if not ca:
        return None
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def register_compiled(name: str, sig: tuple, compiled: Any) -> None:
    """Record the cost analysis of an already-AOT-compiled executable.

    Preferred over :func:`track` when the caller compiles via
    ``lower().compile()`` (JaxSession does): ``Lowered.cost_analysis()``
    returns None on some backends (axon tunnels), while the COMPILED
    executable's analysis is always available — and costs nothing extra,
    the compile was happening anyway."""
    key = (name, sig)
    with _LOCK:
        if key in _COSTS:
            return
    try:
        cost = _cost_dict(compiled.cost_analysis())
    except Exception:
        cost = None
    with _LOCK:
        _COSTS[key] = cost
        _PENDING.pop(key, None)


def count(name: str, sig: tuple, steps: float = 1.0) -> None:
    """Count one call against a cost recorded by register_compiled."""
    with _LOCK:
        _CALLS[(name, sig)] = _CALLS.get((name, sig), 0.0) + steps


def _resolve(key: tuple) -> dict | None:
    jitted, aargs = _PENDING.pop(key)
    try:
        lowered = jitted.lower(*aargs)
        cost = _cost_dict(lowered.cost_analysis())
        if cost is None and jax.default_backend() == "cpu":
            # lowered-only analysis unsupported: compile for real —
            # affordable on CPU, never attempted through a device tunnel
            cost = _cost_dict(lowered.compile().cost_analysis())
        return cost
    except Exception:  # analysis is best-effort; never break the bench
        return None


def cost_report() -> dict[str, dict]:
    """{name: {flops, bytes, calls, analyzed, unanalyzed}} — aggregated
    over all shape signatures seen for that name. flops/bytes are
    call-weighted totals since process start (or the last reset())."""
    with _LOCK:
        pending = list(_PENDING.keys())
    for key in pending:
        with _LOCK:
            if key not in _PENDING:
                continue
        _COSTS[key] = _resolve(key)
    out: dict[str, dict] = {}
    with _LOCK:
        for (name, sig), calls in _CALLS.items():
            d = out.setdefault(
                name,
                {"flops": 0.0, "bytes": 0.0, "calls": 0.0,
                 "analyzed": 0, "unanalyzed": 0},
            )
            d["calls"] += calls
            cost = _COSTS.get((name, sig))
            if cost is None:
                d["unanalyzed"] += 1
            else:
                d["analyzed"] += 1
                d["flops"] += cost["flops"] * calls
                d["bytes"] += cost["bytes"] * calls
        for name, extra in _AR_EXTRA.items():
            d = out.setdefault(
                name,
                {"flops": 0.0, "bytes": 0.0, "calls": 0.0,
                 "analyzed": 0, "unanalyzed": 0},
            )
            d["flops"] += extra["flops"]
            d["bytes"] += extra["bytes"]
            d["ar_analytic"] = True
    return out


def reset() -> None:
    """Zero the call counters (analysis cache is kept — costs are
    shape-determined and reusable)."""
    with _LOCK:
        _CALLS.clear()
        _AR_EXTRA.clear()


def mfu_report(stage_wall_s: dict[str, float],
               stage_names: dict[str, str] | None = None) -> dict:
    """Join analytic costs with measured stage walls.

    ``stage_wall_s``: {stage: seconds} from the tracer.
    ``stage_names``: {program name -> stage} (defaults to identity).
    Returns per-stage {flops, achieved_tflops, mfu, compute_bound_ms}
    plus a total. ``compute_bound_ms`` = flops/peak + hbm bytes/BW —
    what the stage costs when the wire is no longer the ceiling.
    """
    costs = cost_report()
    per_stage: dict[str, dict] = {}
    for name, c in costs.items():
        stage = (stage_names or {}).get(name, name)
        d = per_stage.setdefault(stage, {"flops": 0.0, "bytes": 0.0})
        d["flops"] += c["flops"]
        d["bytes"] += c["bytes"]
    out: dict[str, Any] = {"stages": {}}
    tot_flops = 0.0
    for stage, d in per_stage.items():
        wall = stage_wall_s.get(stage)
        achieved = d["flops"] / wall if wall else None
        out["stages"][stage] = {
            "gflops": round(d["flops"] / 1e9, 2),
            "achieved_tflops": round(achieved / 1e12, 3) if achieved else None,
            "mfu": round(achieved / CHIP_PEAK_FLOPS, 4) if achieved else None,
            "compute_bound_ms": round(
                (d["flops"] / CHIP_PEAK_FLOPS
                 + d["bytes"] / (CHIP_HBM_GBPS * 1e9)) * 1e3, 2),
        }
        tot_flops += d["flops"]
    wall_total = sum(v for v in stage_wall_s.values() if v)
    out["total_gflops"] = round(tot_flops / 1e9, 2)
    if wall_total:
        out["mfu_total"] = round(tot_flops / wall_total / CHIP_PEAK_FLOPS, 4)
    out["chip_peak_tflops_bf16"] = CHIP_PEAK_FLOPS / 1e12
    out["note"] = (
        "flops are XLA HLO cost-analysis (analytic); AR decoders are "
        "counted per decode step via track(steps=)"
    )
    return out
