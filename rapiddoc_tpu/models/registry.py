"""Model registry: builds the model stack from available checkpoints.

Counterpart of the reference's AtomModelSingleton/model_init
(reference: rapid_doc/backend/pipeline/model_init.py:57-134 + per-stack
default_models.yaml registries). Checkpoints are orbax/npz trees under
get_models_dir(); converted from the published torch checkpoints by
rapiddoc_tpu.models.<family>.convert. When a checkpoint is missing the
model is built random-init (structure-complete, quality pending weights)
or skipped, keeping the pipeline runnable in weightless environments.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..config import get_models_dir
from ..pipeline.scheduler import DocumentAnalyzer
from ..utils.logging import get_logger

logger = get_logger("rapiddoc_tpu.registry")


def _load_variables(path: Path):
    """Load a flax variables tree from .npz (flat keys 'a/b/c').

    float16 leaves (the demo checkpoints ship half-precision to halve
    the asset size) are upcast to float32 — the compute dtype policy
    (bfloat16 casts in each engine) is unchanged."""
    if not path.is_file():
        return None
    flat = dict(np.load(str(path), allow_pickle=False))
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if val.dtype == np.float16:
            val = val.astype(np.float32)
        node[parts[-1]] = val
    return tree


def save_variables(variables, path: Path | str,
                   half: bool = False) -> None:
    """half=True stores float32 leaves as float16 (demo assets —
    _load_variables upcasts on read)."""
    path = Path(path)
    flat: dict[str, np.ndarray] = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(v, key)
            else:
                arr = np.asarray(v)
                if half and arr.dtype == np.float32:
                    arr = arr.astype(np.float16)
                flat[key] = arr

    walk(variables)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(str(path), **flat)


DEMO_ASSETS_DIR = Path(__file__).resolve().parent.parent / "assets"


def build_ocr_system(configs: dict | None = None, lang: str = "ch"):
    from .ocr.engine import TextDetector, TextRecognizer, TextSystem

    if os.environ.get("RAPIDDOC_DISABLE_OCR"):
        return None
    models_dir = get_models_dir()
    det_vars = _load_variables(models_dir / "ocr_det_v6_small.npz")
    # the v6-small dict covers ch+en; other langs use per-lang rec
    # checkpoints when converted (reference: per-lang rapidocr models)
    rec_vars = None
    rec_charset = None
    rec_lang_demo = False
    if lang not in ("ch", "en", "", None):
        rec_vars = _load_variables(models_dir / f"ocr_rec_{lang}.npz")
        lang_dict = models_dir / f"ocr_rec_{lang}_dict.txt"
        if rec_vars is None:
            # in-repo per-lang demo checkpoint (train/rec.py --lang=<l>)
            rec_vars = _load_variables(
                DEMO_ASSETS_DIR / f"ocr_rec_{lang}_demo.npz"
            )
            lang_dict = DEMO_ASSETS_DIR / f"ocr_rec_{lang}_dict.txt"
            if rec_vars is not None:
                rec_lang_demo = True
                logger.info(
                    "OCR rec: per-lang demo checkpoint (%s)", lang
                )
        if rec_vars is not None and lang_dict.is_file():
            rec_charset = [
                ln.rstrip("\n\r")
                for ln in lang_dict.read_text(encoding="utf-8").splitlines()
                if ln
            ]
        elif rec_vars is not None:
            # weights without their dictionary would decode through the
            # WRONG glyph table (silently garbled text) — refuse the
            # checkpoint and fall back to the default rec model
            logger.warning(
                "per-lang rec weights for %r found but the matching "
                "dict file (%s) is missing — ignoring them; ship both "
                "ocr_rec_%s.npz AND ocr_rec_%s_dict.txt",
                lang, lang_dict.name, lang, lang,
            )
            rec_vars = None
            rec_lang_demo = False
    if rec_vars is None:
        rec_vars = _load_variables(models_dir / "ocr_rec_v6_small.npz")
    det_demo = rec_demo = False
    rec_demo = rec_lang_demo  # demo-trained per-lang weights want the
    # same contrast-stretch preprocessing as the main demo checkpoint
    if det_vars is None:
        # in-repo demo checkpoint trained on synthetic documents
        # (rapiddoc_tpu/train) — real text output without network egress
        det_vars = _load_variables(DEMO_ASSETS_DIR / "ocr_det_demo.npz")
        if det_vars is not None:
            det_demo = True
            logger.info("OCR det: demo synthetic-trained checkpoint")
    if rec_vars is None:
        rec_vars = _load_variables(DEMO_ASSETS_DIR / "ocr_rec_demo.npz")
        if rec_vars is not None:
            from ..train.synth import DEMO_CHARSET

            rec_charset = DEMO_CHARSET
            rec_demo = True
            logger.info("OCR rec: demo synthetic-trained checkpoint")
    cfg = configs or {}
    # demo checkpoints see only full-dynamic-range synthetic ink, so
    # faded scans get a percentile contrast stretch (pre_post.
    # contrast_stretch); published checkpoints run the reference
    # preprocessing unmodified. RAPIDDOC_CONTRAST_STRETCH=0/1 overrides.
    stretch_env = os.environ.get("RAPIDDOC_CONTRAST_STRETCH")
    det_stretch = det_demo if stretch_env is None else stretch_env == "1"
    rec_stretch = rec_demo if stretch_env is None else stretch_env == "1"
    det = TextDetector(
        det_vars,
        limit_side_len=int(cfg.get("Det.limit_side_len", 960)),
        contrast_stretch=det_stretch,
    )
    rec = TextRecognizer(
        rec_vars, charset=rec_charset, contrast_stretch=rec_stretch
    )
    if det_vars is None or rec_vars is None:
        logger.warning(
            "OCR checkpoints not found under %s — using random init "
            "(structure-complete; convert published weights for quality)",
            models_dir,
        )
    return TextSystem(det, rec)


def build_layout_model(configs: dict | None = None):
    if os.environ.get("RAPIDDOC_DISABLE_LAYOUT"):
        return None
    try:
        from .layout.engine import LayoutDetector

        return LayoutDetector.build(configs or {})
    except (ImportError, FileNotFoundError):
        return None


def build_formula_model(configs: dict | None = None):
    if os.environ.get("RAPIDDOC_DISABLE_FORMULA"):
        return None
    try:
        from .formula.engine import FormulaRecognizer

        return FormulaRecognizer.build(configs or {})
    except (ImportError, FileNotFoundError):
        return None


def build_table_model(configs: dict | None = None):
    if os.environ.get("RAPIDDOC_DISABLE_TABLE"):
        return None
    try:
        from .table.engine import TableRecognizer

        return TableRecognizer.build(configs or {})
    except (ImportError, FileNotFoundError):
        return None


def build_analyzer(
    lang: str = "ch",
    formula_enable: bool = True,
    table_enable: bool = True,
    configs: dict | None = None,
) -> DocumentAnalyzer:
    from .custom import resolve_custom

    configs = configs or {}
    for stage, cfg in configs.items():
        # reference configs carry onnxruntime/OpenVINO/CANN engine
        # selection (engine_cfg / use_cuda / use_cann); there is one
        # engine here (XLA) — accept and ignore, loudly
        if isinstance(cfg, dict) and (
            "engine_cfg" in cfg or "use_cuda" in cfg or "use_cann" in cfg
        ):
            logger.warning(
                "%s config: engine_cfg/use_cuda/use_cann are reference "
                "onnxruntime knobs; ignored (the XLA engine targets "
                "whatever device JAX sees)", stage,
            )
    layout = resolve_custom(configs.get("layout"), "layout") or build_layout_model(
        configs.get("layout")
    )
    ocr = resolve_custom(configs.get("ocr"), "ocr") or build_ocr_system(
        configs.get("ocr"), lang=lang
    )
    formula = resolve_custom(configs.get("formula"), "formula") or (
        build_formula_model(configs.get("formula")) if formula_enable else None
    )
    table = resolve_custom(configs.get("table"), "table") or (
        build_table_model(configs.get("table")) if table_enable else None
    )
    checkbox_cfg = configs.get("checkbox") or {}
    orientation = None
    from ..config import env_bool

    if env_bool("USE_DOC_ORIENTATION_CLASSIFY") or os.environ.get(
        "USE_DOC_ORIENTATION_CLASSIFY", ""
    ).lower() in ("1", "true", "yes"):
        # reference gate: USE_DOC_ORIENTATION_CLASSIFY env
        # (config_reader.py:78-133); classifier is cheap, random-init safe
        try:
            from .orientation.engine import build_orientation_classifier

            orient_vars = _load_variables(
                get_models_dir() / "orientation_cls.npz"
            )
            if orient_vars is None:
                orient_vars = _load_variables(
                    DEMO_ASSETS_DIR / "orientation_demo.npz"
                )
                if orient_vars is not None:
                    logger.info(
                        "orientation: demo synthetic-trained checkpoint"
                    )
            orientation = build_orientation_classifier(
                get_models_dir(), orient_vars
            )
        except Exception:
            orientation = None
    return DocumentAnalyzer(
        layout_model=layout,
        ocr_system=ocr,
        formula_model=formula if formula_enable else None,
        table_model=table if table_enable else None,
        orientation_model=orientation,
        formula_enable=formula_enable,
        table_enable=table_enable,
        checkbox_enable=checkbox_cfg.get(
            "checkbox_enable", checkbox_cfg.get("enable", False)
        ),
    )
