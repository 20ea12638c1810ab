"""Checkpoint conversion: published torch checkpoints -> framework npz trees.

Usage:
    python -m rapiddoc_tpu.tools.convert_weights det /path/to/det.safetensors
    python -m rapiddoc_tpu.tools.convert_weights rec /path/to/rec.safetensors
    python -m rapiddoc_tpu.tools.convert_weights formula /path/to/formula.pth

Converted trees land in the models dir (config.get_models_dir()) where the
registry picks them up; each conversion verifies output parity against the
torch network when torch is available.
"""
from __future__ import annotations

import sys
from pathlib import Path

from ..config import get_models_dir
from ..models.registry import save_variables
from ..utils.logging import get_logger

logger = get_logger("rapiddoc_tpu.convert")


def _load_torch_state(path: Path) -> dict:
    if path.suffix == ".safetensors":
        try:
            from safetensors.torch import load_file

            return load_file(str(path))
        except ImportError:
            from safetensors import safe_open  # type: ignore

            out = {}
            with safe_open(str(path), framework="np") as f:  # type: ignore
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj


def convert_det(src: Path, out: Path | None = None) -> Path:
    from ..models.ocr.convert import det_variables_from_torch

    variables = det_variables_from_torch(_load_torch_state(src))
    target = out or get_models_dir() / "ocr_det_v6_small.npz"
    save_variables(variables, target)
    logger.info("det weights -> %s", target)
    return target


def convert_rec(src: Path, out: Path | None = None) -> Path:
    from ..models.ocr.convert import rec_variables_from_torch

    variables = rec_variables_from_torch(_load_torch_state(src))
    target = out or get_models_dir() / "ocr_rec_v6_small.npz"
    save_variables(variables, target)
    logger.info("rec weights -> %s", target)
    return target


def convert_formula(src: Path, out: Path | None = None) -> Path:
    """Full PP-FormulaNet_plus .pth (BaseModel layout) -> npz tree.

    Converts the PPHGNetV2-B6 encoder, enc_to_dec_proj, the 6-layer MBart
    decoder and lm_head (reference: inference_engine/torch.py:51-56).
    """
    from ..models.formula.convert import (
        decoder_variables_from_torch,
        formula_variables_from_torch,
    )

    sd = _load_torch_state(src)
    if any(k.startswith("backbone.") for k in sd):
        variables = formula_variables_from_torch(sd)
    else:
        # bare HF-MBart-style decoder checkpoint (no encoder weights)
        dec_vars, mem_vars = decoder_variables_from_torch(sd)
        variables = {"decoder": dec_vars, "mem_proj": mem_vars}
    target = out or get_models_dir() / "formula_net_plus_m.npz"
    save_variables(variables, target)
    logger.info("formula weights -> %s", target)
    return target


def convert_unitable(src: Path, out: Path | None = None) -> Path:
    """Published UNITABLE checkpoint dir (encoder.pth + decoder.pth +
    vocab.json, reference: rapid_table_self/default_models.yaml unitable
    entry) -> npz tree + vocab asset."""
    from ..models.table.convert import unitable_variables_from_torch

    if src.is_dir():
        enc_path, dec_path = src / "encoder.pth", src / "decoder.pth"
    else:
        enc_path, dec_path = src, src.parent / "decoder.pth"
    variables = unitable_variables_from_torch(
        _load_torch_state(enc_path), _load_torch_state(dec_path)
    )
    target = out or get_models_dir() / "table_unitable.npz"
    save_variables(variables, target)
    vocab_src = (src if src.is_dir() else src.parent) / "vocab.json"
    if vocab_src.is_file():
        import shutil

        shutil.copy(vocab_src, get_models_dir() / "unitable_vocab.json")
    logger.info("unitable weights -> %s", target)
    return target


def convert_formula_dict(src: Path, out: Path | None = None) -> Path:
    """Published inference yml -> formula_tokenizer.json asset.

    The reference ships the UniMERNet tokenizer embedded in the model's
    inference yaml (PostProcess.character_dict.fast_tokenizer_file,
    reference: model_handler/pp_formulanet_plus/post_process.py:92-96).
    """
    import json

    import yaml

    data = yaml.safe_load(src.read_text(encoding="utf-8"))
    chardict = data["PostProcess"]["character_dict"]
    tok = chardict["fast_tokenizer_file"]
    target = out or get_models_dir() / "formula_tokenizer.json"
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(json.dumps(tok), encoding="utf-8")
    logger.info("formula tokenizer -> %s", target)
    return target


def convert_dict(src: Path, out: Path | None = None) -> Path:
    """Install a rec character dict (plain copy into the models dir)."""
    import shutil

    target = out or get_models_dir() / src.name
    target.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(src, target)
    logger.info("dict -> %s", target)
    return target


CONVERTERS = {
    "det": convert_det,
    "rec": convert_rec,
    "formula": convert_formula,
    "formula_dict": convert_formula_dict,
    "unitable": convert_unitable,
    "dict": convert_dict,
}


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[0] not in CONVERTERS:
        print(__doc__)
        return 2
    kind, src = argv[0], Path(argv[1])
    if not src.is_file():
        print(f"checkpoint not found: {src}")
        return 1
    out = Path(argv[2]) if len(argv) > 2 else None
    CONVERTERS[kind](src, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
